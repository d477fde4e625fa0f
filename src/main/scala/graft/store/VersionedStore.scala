package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Versioned measurement store (SURVEY.md §1.5 storage-format
  * adjudication): the two Delta-lake capabilities the plain
  * [[MeasurementStore]] deliberately does not replicate — TIME TRAVEL and
  * CONCURRENT-WRITER safety — provided by the same mechanism Delta itself
  * uses: an append-only transaction log over immutable parquet data files.
  * No Delta jars exist in this environment (and the build may not add
  * dependencies), so the log is implemented directly:
  *
  *  - Layout: `<root>/<table>/data/day=YYYY-MM-DD/<commit>-<part>.parquet`
  *    immutable data files (a writer NEVER mutates or deletes a live file;
  *    only `vacuum` deletes, and only files no retained snapshot
  *    references), plus `<root>/<table>/_log/<%020d>.manifest` commit
  *    files. A manifest is a line-based record — `v N` / `op …` /
  *    `+ relpath` (add) / `- relpath` (remove) / `floor V` — append-only
  *    and rewritten never, exactly Delta's JSON actions minus the JSON.
  *  - Snapshot AS OF version N = replay manifests 0..N (adds minus
  *    removes). `read` is `readAsOf(latestVersion)`; history is the log.
  *  - Commit protocol: a writer computes its change against snapshot N,
  *    stages new files, then publishes manifest N+1 with CREATE-EXCLUSIVE
  *    semantics (an atomic hard-link of a fully-written temp file on
  *    POSIX; HDFS `create(overwrite=false)` is the same primitive at
  *    cluster scale — object stores need a coordinating LogStore, the
  *    identical caveat Delta documents). A loser gets a conflict, re-reads
  *    the new snapshot, REBASES (appends re-publish the same staged files;
  *    upserts re-merge against the new snapshot) and retries: optimistic
  *    concurrency, no locks held across the distributed work.
  *
  * At 100 TB: commits are O(touched files) metadata; readers of version N
  * are never torn (a manifest appears atomically or not at all) and run
  * against immutable files, so long queries are snapshot-isolated from
  * concurrent ingest — the property the day-overwriting store cannot give.
  */
class VersionedStore(spark: SparkSession, root: String) {

  import VersionedStore._

  private def fsOf(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())
  private def tableDir(t: String) = s"$root/$t"
  private def logDir(t: String) = s"${tableDir(t)}/_log"
  private def dataDir(t: String) = s"${tableDir(t)}/data"

  /** OCC conflicts observed (commit lost the race and was retried) —
    * the concurrency spec's observable. */
  @volatile private[graft] var occConflicts: Int = 0

  /** Test seam: called once per commit ATTEMPT, before the exclusive
    * publish — a spec override barriers two writers here to force both
    * to target the same version. */
  protected def beforeCommit(table: String, version: Long): Unit = ()

  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("day", date_format(col("time"), "yyyy-MM-dd"))

  // ---------------------------------------------------------------- log

  def latestVersion(table: String): Long = {
    val dir = new org.apache.hadoop.fs.Path(logDir(table))
    val fs = fsOf(dir)
    if (!fs.exists(dir)) -1L
    else fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .collect { case ManifestName(v) => v.toLong }
      .foldLeft(-1L)(math.max)
  }

  private def readManifest(table: String, version: Long): Commit = {
    val p = new org.apache.hadoop.fs.Path(
      logDir(table), f"$version%020d.manifest")
    val in = fsOf(p).open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val adds = Seq.newBuilder[String]
    val removes = Seq.newBuilder[String]
    var op = ""
    var floor = 0L
    text.linesIterator.foreach {
      case l if l.startsWith("+ ") => adds += l.drop(2)
      case l if l.startsWith("- ") => removes += l.drop(2)
      case l if l.startsWith("op ") => op = l.drop(3)
      case l if l.startsWith("floor ") => floor = l.drop(6).toLong
      case _ => ()
    }
    Commit(version, op, adds.result(), removes.result(), floor)
  }

  private def commits(table: String): Seq[Commit] = {
    val latest = latestVersion(table)
    (0L to latest).map(readManifest(table, _))
  }

  /** The earliest version still readable — raised by [[vacuum]], which
    * deletes the data files older snapshots reference. */
  def readFloor(table: String): Long =
    commits(table).foldLeft(0L)((f, c) => math.max(f, c.floor))

  /** Data files (table-relative) visible at `asOf` — the log replay. */
  def snapshotFiles(table: String, asOf: Long): Seq[String] = {
    val latest = latestVersion(table)
    require(asOf >= 0 && asOf <= latest,
      s"version $asOf out of range: table '$table' has versions 0..$latest")
    val all = commits(table)
    val floor = all.foldLeft(0L)((f, c) => math.max(f, c.floor))
    require(asOf >= floor,
      s"version $asOf was vacuumed: earliest readable version is $floor")
    val live = scala.collection.mutable.LinkedHashSet.empty[String]
    all.takeWhile(_.version <= asOf).foreach { c =>
      c.removes.foreach(live -= _)
      c.adds.foreach(live += _)
    }
    live.toSeq
  }

  /** Publish manifest `version`. Returns false on an OCC conflict (some
    * other writer published this version first). The temp file is fully
    * written before the atomic link, so a reader can never observe a torn
    * manifest. */
  private def tryCommit(table: String, version: Long, op: String,
    adds: Seq[String], removes: Seq[String], floor: Long = 0L): Boolean = {
    beforeCommit(table, version)
    val dir = java.nio.file.Paths.get(logDir(table))
    java.nio.file.Files.createDirectories(dir)
    val body = new StringBuilder()
    body ++= s"v $version\nop $op\n"
    if (floor > 0) body ++= s"floor $floor\n"
    removes.foreach(r => body ++= s"- $r\n")
    adds.foreach(a => body ++= s"+ $a\n")
    val tmp = java.nio.file.Files.createTempFile(dir, ".tmp-", ".manifest")
    java.nio.file.Files.write(tmp,
      body.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val target = dir.resolve(f"$version%020d.manifest")
    try {
      // hard-link = POSIX atomic create-exclusive of a complete file
      java.nio.file.Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        synchronized { occConflicts += 1 }
        false
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
      ()
    }
  }

  // --------------------------------------------------------------- data

  /** Write `df` to a staging dir, move the parts into the shared
    * `data/day=…` layout under commit-unique names, return the
    * table-relative paths. Metadata-only moves; the files are live the
    * moment a manifest references them and garbage until then. */
  private def stageFiles(table: String, df: DataFrame): Seq[String] = {
    val commitId = java.util.UUID.randomUUID().toString.take(8)
    val stage = s"${tableDir(table)}/_stage/c-$commitId"
    withDay(df).write.partitionBy("day").parquet(stage)
    val stagePath = new org.apache.hadoop.fs.Path(stage)
    val fs = fsOf(stagePath)
    val rels = Seq.newBuilder[String]
    fs.listStatus(stagePath).filter(_.isDirectory).foreach { dayDir =>
      val day = dayDir.getPath.getName // day=YYYY-MM-DD
      val destDir = new org.apache.hadoop.fs.Path(s"${dataDir(table)}/$day")
      fs.mkdirs(destDir)
      fs.listStatus(dayDir.getPath)
        .filter(_.getPath.getName.startsWith("part-")).foreach { f =>
          val name = s"c$commitId-${f.getPath.getName}"
          require(fs.rename(f.getPath,
            new org.apache.hadoop.fs.Path(destDir, name)),
            s"stage move failed for ${f.getPath}")
          rels += s"$day/$name"
        }
    }
    fs.delete(stagePath, true)
    rels.result()
  }

  private def readFiles(table: String, rels: Seq[String]): DataFrame = {
    val base = dataDir(table)
    if (rels.isEmpty)
      spark.emptyDataFrame
    else
      spark.read.option("basePath", base)
        .parquet(rels.map(r => s"$base/$r"): _*)
        .withColumn("day", col("day").cast("string"))
  }

  // ---------------------------------------------------------------- api

  /** Append points (day partition derived from `time`); returns the
    * committed version. A blind append conflicts with nothing — on a lost
    * race it republishes the SAME staged files at the next version. */
  def append(table: String, points: DataFrame): Long = {
    val adds = stageFiles(table, points)
    var v = latestVersion(table) + 1
    while (!tryCommit(table, v, "append", adds, Nil))
      v = latestVersion(table) + 1
    v
  }

  /** Upsert on `keys`, last-write-wins by `versionCol`, the same merge
    * contract as [[MeasurementStore.upsert]] — but non-destructive: the
    * touched days' current files are logically REMOVED by the manifest and
    * replaced by the merged rewrite, so every prior version stays
    * readable. On a lost race the merge is recomputed against the new
    * snapshot (true rebase — a concurrent disjoint-day writer's rows
    * survive) and the orphaned staged files are dropped. */
  def upsert(table: String, updates: DataFrame,
    keys: Seq[String], versionCol: String): Long = {
    val up = withDay(updates)
    val days = up.select("day").distinct().collect()
      .map(_.getString(0)).toIndexedSeq.sorted
    if (days.isEmpty) return latestVersion(table)
    val dayPrefixes = days.map(d => s"day=$d/")
    var committed = -1L
    while (committed < 0) {
      val base = latestVersion(table)
      val touched =
        if (base < 0) Nil
        else snapshotFiles(table, base)
          .filter(f => dayPrefixes.exists(f.startsWith))
      val existing = readFiles(table, touched)
      val merged =
        if (existing.isEmpty) up
        else {
          val all = existing.unionByName(up, allowMissingColumns = true)
          val w = Window.partitionBy(keys.map(col): _*)
            .orderBy(col(versionCol).desc_nulls_last)
          all.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1).drop("__rn")
        }
      val adds = stageFiles(table, merged.drop("day"))
      if (tryCommit(table, base + 1, "upsert", adds, touched))
        committed = base + 1
      else {
        // rebase: the snapshot moved under us — unpublish the staged
        // files and redo the merge against the new snapshot
        val fs = fsOf(new org.apache.hadoop.fs.Path(dataDir(table)))
        adds.foreach(r => fs.delete(
          new org.apache.hadoop.fs.Path(s"${dataDir(table)}/$r"), false))
      }
    }
    committed
  }

  /** The table as of `version` — every committed version back to the
    * vacuum floor is readable, torn never. */
  def readAsOf(table: String, version: Long): DataFrame =
    readFiles(table, snapshotFiles(table, version))

  def read(table: String): DataFrame =
    readAsOf(table, latestVersion(table))

  /** The commit log: (version, op, files added, files removed). */
  def history(table: String): Seq[(Long, String, Int, Int)] =
    commits(table).map(c => (c.version, c.op, c.adds.size, c.removes.size))

  /** Delete data files no snapshot ≥ (latest − retainLast + 1) references
    * and raise the read floor — the history-bounding half of the Delta
    * contract. Returns the deleted table-relative paths. The floor commit
    * itself goes through the same OCC publish, so a concurrent writer
    * can't race the horizon. */
  def vacuum(table: String, retainLast: Int): Seq[String] = {
    require(retainLast >= 1, "must retain at least the latest version")
    var deleted: Seq[String] = null
    while (deleted == null) {
      val latest = latestVersion(table)
      val floor = math.max(readFloor(table), latest - retainLast + 1)
      val referenced = (floor to latest)
        .flatMap(snapshotFiles(table, _)).toSet
      val all = commits(table).flatMap(_.adds).distinct
      val victims = all.filterNot(referenced)
      if (tryCommit(table, latest + 1, "vacuum", Nil, Nil, floor = floor)) {
        val fs = fsOf(new org.apache.hadoop.fs.Path(dataDir(table)))
        victims.foreach(r => fs.delete(
          new org.apache.hadoop.fs.Path(s"${dataDir(table)}/$r"), false))
        deleted = victims
      }
    }
    deleted
  }
}

object VersionedStore {
  private val ManifestName = """(\d{20})\.manifest""".r
  private[store] case class Commit(version: Long, op: String,
    adds: Seq[String], removes: Seq[String], floor: Long)
}
