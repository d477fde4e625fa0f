package graft.store

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement store (SURVEY.md §1.5, §4): the InfluxDB-measurement
  * abstraction on partitioned parquet.
  *
  *  - Layout: `<root>/<measurement>/day=YYYY-MM-DD/` parquet files with tag
  *    columns inline — date partition pruning serves the reference's
  *    universal `time >= a AND time <= b` predicate
  *    (get_hot_intake_interval.py:117); tag predicates push to parquet
  *    row groups.
  *  - Upsert on (tags, time) (InfluxDB point semantics the reference relies
  *    on for idempotent re-ingest, transfer_manager.py:199-208): last-write-
  *    wins by a version column, implemented as read-modify-overwrite of only
  *    the date partitions present in the update batch (dynamic partition
  *    overwrite — the parquet stand-in for a Delta MERGE; no Delta jars in
  *    this environment).
  *  - Retention (memory_manager.py:3-17): drop oldest day partitions beyond
  *    a row budget.
  *
  * At 100 TB: day partitions bound every rewrite to the touched days; the
  * version-dedup shuffle is keyed by (tags, time) and AQE-coalesced.
  */
class MeasurementStore(spark: SparkSession, root: String) {

  private def path(measurement: String) = s"$root/$measurement"

  private def withDay(df: DataFrame): DataFrame =
    df.withColumn("day", date_format(col("time"), "yyyy-MM-dd"))

  /** Partition-column type inference reads `day=` back as DATE; pin it to
    * the string form the writers use. */
  private def readRaw(measurement: String): DataFrame =
    spark.read.parquet(path(measurement))
      .withColumn("day", col("day").cast("string"))

  /** Append points; day partition derived from `time`. */
  def append(measurement: String, points: DataFrame): Unit =
    withDay(points).write.mode(SaveMode.Append)
      .partitionBy("day").parquet(path(measurement))

  /** Upsert points on key columns, last-write-wins by `versionCol`. Only
    * the day partitions present in `updates` are rewritten. With
    * `dropVersion` the version column is bookkeeping synthesized by the
    * caller (e.g. a CQ micro-batch id) and is dropped before the write, so
    * the stored measurement's schema matches a batch-produced one; stored
    * rows then carry no version and lose ties to any update row
    * (`desc_nulls_last`), which is exactly last-write-wins. */
  def upsert(measurement: String, updates: DataFrame,
    keys: Seq[String], versionCol: String,
    dropVersion: Boolean = false): Unit = {
    val up = withDay(updates)
    val days = up.select("day").distinct().collect()
      .map(_.getString(0)).toIndexedSeq
    // an empty update is a no-op — without this, an Overwrite write of the
    // empty frame under STATIC partition-overwrite semantics would wipe
    // every existing partition (streaming drains emit a trailing empty
    // watermark-commit batch, which must not touch the measurement)
    if (days.isEmpty) return
    val existing =
      try readRaw(measurement).filter(col("day").isin(days: _*))
      catch { case _: Throwable => spark.emptyDataFrame }
    val merged =
      if (existing.isEmpty) up
      else {
        val all = existing.unionByName(up, allowMissingColumns = true)
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col(versionCol).desc_nulls_last)
        all.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      }
    val toWrite = if (dropVersion) merged.drop(versionCol) else merged
    // overwrite only the touched day partitions; the conf must be set on
    // the frame's OWN session — inside foreachBatch that is the streaming
    // query's cloned session, and setting it on the outer session would
    // leave the write in static mode (wiping untouched partitions)
    val sess = toWrite.sparkSession
    val conf = "spark.sql.sources.partitionOverwriteMode"
    val prev = sess.conf.getOption(conf)
    sess.conf.set(conf, "dynamic")
    try toWrite.write.mode(SaveMode.Overwrite)
      .partitionBy("day").parquet(path(measurement))
    finally prev.foreach(sess.conf.set(conf, _))
  }

  /** Read with pushdown-friendly predicates; day-partition pruning applies
    * to time-range filters phrased on `day`. */
  def read(measurement: String, predicate: Column = lit(true)): DataFrame =
    readRaw(measurement).filter(predicate)

  /** Read with PARQUET SCHEMA MERGING across appends — the
    * schema-evolution read path: a measurement whose later days gained
    * field columns surfaces the UNION schema, pre-evolution rows NULL in
    * the new fields (exactly InfluxDB's field semantics: fields appear
    * when first written, earlier points simply lack them). Schema merging
    * costs one footer read per file, which is why it is opt-in here
    * rather than [[read]]'s default — a deployment flips to it only for
    * measurements it knows evolved. */
  def readMerged(measurement: String, predicate: Column = lit(true)): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path(measurement))
      .withColumn("day", col("day").cast("string"))
      .filter(predicate)

  /** Run a literal InfluxQL string against a stored measurement — the
    * reference deployment's actual query path (CLI / Grafana / the
    * analytics scripts all speak InfluxQL at the store). Time-range
    * conjuncts additionally prune day partitions before the translated
    * plan runs (the `day=` layout serves the universal
    * `time >= a AND time <= b` predicate). A `SELECT ... INTO target`
    * appends the result to the target measurement — the reference's
    * read-transform-write loop (get_hot_intake_interval.py:68-85 writes
    * the derived rates back through write_points) as one statement. */
  def influxql(measurement: String, query: String): DataFrame = {
    val q = graft.influxql.InfluxQL.parse(query)
    val result = graft.influxql.InfluxQL.run(spark,
      prunedFrame(measurement, q), query)
    q.into.foreach { target =>
      // the :MEASUREMENT backreference resolves to THIS measurement in
      // the single-source form (the fan-out form is influxqlAll)
      val resolved = graft.influxql.InfluxQL.backrefPrefix(target)
        .map(p => s"$p.$measurement").getOrElse(target)
      append(resolved, result)
    }
    result
  }

  /** Day-pruned frame for one measurement under a parsed query's time
    * bounds. Pruning only applies to string time literals — a numeric
    * epoch bound (Right) would otherwise become to_timestamp('') and prune
    * every partition; the translated plan still filters those rows
    * correctly. */
  private def prunedFrame(measurement: String,
    q: graft.influxql.InfluxQL.Query): DataFrame =
    q.conds
      .filter(c => c.col == "time" && c.value.isLeft)
      .foldLeft(readRaw(measurement)) { (df, c) =>
        val day = date_format(
          to_timestamp(lit(c.value.swap.getOrElse(""))), "yyyy-MM-dd")
        c.op match {
          case ">" | ">=" => df.filter(col("day") >= day)
          case "<" | "<=" => df.filter(col("day") <= day)
          case _ => df
        }
      }.drop("day")

  /** The store's measurement directory: one entry per measurement dir
    * under the root (dot-prefixed staging/checkpoint dirs excluded) —
    * bounded metadata, like the day lists. */
  def measurementNames: Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filterNot(_.startsWith("."))
      .sorted
  }

  /** `SHOW SHARDS` over this store's layout: one shard per distinct day
    * partition across all measurements (a shard holds every measurement's
    * points for its time range, as InfluxDB's shard groups do; this
    * store's group duration IS one day — the layout above). Pure
    * metadata: a directory listing per measurement, bounded like the day
    * lists; the time columns derive in-plan under the session timezone.
    * `expiry_time` = `end_time` for the infinite default retention.
    *
    * InfluxDB's columns: (id, database, retention_policy, shard_group,
    * start_time, end_time, expiry_time, owners); ids are assigned in
    * time order, `owners` is the data-node list — "1", this single
    * logical store (on a cluster, executors hold partitions of every
    * shard; ownership is not a per-shard concept on Spark). */
  def showShards(database: String = "graft",
    retentionPolicy: String = "autogen"): DataFrame = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val days = measurementNames.flatMap { m =>
      val mPath = new org.apache.hadoop.fs.Path(path(m))
      fs.listStatus(mPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(_.getPath.getName.stripPrefix("day="))
    }.distinct.sorted
    import spark.implicits._
    days.zipWithIndex.map { case (d, i) => (i + 1L, d) }.toDF("id", "day")
      .withColumn("database", lit(database))
      .withColumn("retention_policy", lit(retentionPolicy))
      .withColumn("shard_group", col("id"))
      .withColumn("start_time", to_timestamp(col("day")))
      .withColumn("end_time", col("start_time") + expr("INTERVAL 1 DAY"))
      .withColumn("expiry_time", col("end_time"))
      .withColumn("owners", lit("1"))
      .select("id", "database", "retention_policy", "shard_group",
        "start_time", "end_time", "expiry_time", "owners")
  }

  /** `SHOW SHARD GROUPS`: the same day listing as [[showShards]] without
    * the per-shard ownership columns — InfluxDB's shard-group view
    * (id, database, retention_policy, start_time, end_time, expiry_time).
    * One group per day; in this layout group and shard are 1:1 (single
    * logical store), so ids line up with [[showShards]]. */
  def showShardGroups(database: String = "graft",
    retentionPolicy: String = "autogen"): DataFrame =
    showShards(database, retentionPolicy)
      .select("id", "database", "retention_policy",
        "start_time", "end_time", "expiry_time")

  /** `DROP SHARD <id>`: delete one shard's data — this layout's day
    * partition, across every measurement that has it — as a pure metadata
    * operation (directory deletes, no data read). The manual half of
    * retention (the automatic half is [[MeasurementCatalog.applyRetention]]
    * driving [[deleteWhere]]); InfluxDB operators drop shards to reclaim
    * space NOW rather than waiting for expiry. The id is resolved against
    * the CURRENT [[showShards]] listing (ids are positional over the
    * sorted day set, as InfluxDB's are over its shard registry). Returns
    * the dropped day. Unknown ids fail loudly. */
  def dropShard(id: Long): String = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val days = measurementNames.flatMap { m =>
      val mPath = new org.apache.hadoop.fs.Path(path(m))
      fs.listStatus(mPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(_.getPath.getName.stripPrefix("day="))
    }.distinct.sorted
    if (id < 1 || id > days.length)
      throw new IllegalArgumentException(
        s"unknown shard id $id (store has ${days.length} shards)")
    val day = days(id.toInt - 1)
    measurementNames.foreach { m =>
      fs.delete(new org.apache.hadoop.fs.Path(
        new org.apache.hadoop.fs.Path(path(m)), s"day=$day"), true)
    }
    day
  }

  /** Store-wide form of [[influxql]]: `FROM /regex/` (or a FROM list)
    * resolves against [[measurementNames]], each source day-pruned before
    * its per-measurement run, and an `INTO <rp>.:MEASUREMENT`
    * backreference fans out ONE WRITE PER SOURCE — InfluxDB's
    * downsample-everything idiom (`SELECT mean(*) INTO "weekly".:MEASUREMENT
    * FROM /^ciws/ GROUP BY time(1h), *`): each source measurement's result
    * lands in its own `<rp>.<source>` target through the normal
    * day-partitioned append. A bare `INTO :MEASUREMENT` is rejected loudly
    * (it would append every source's result onto itself). Returns the
    * union frame with the leading `measurement` column, as
    * [[graft.influxql.InfluxQL.runCatalog]] shapes it. */
  def influxqlAll(query: String): DataFrame = {
    val q = graft.influxql.InfluxQL.parse(query)
    // resolve the FROM clause against the directory FIRST: only matching
    // measurements get a frame (an eager parquet read per entry — an
    // emptied or unrelated measurement must not cost a schema inference,
    // or fail the statement, for a query that never touches it)
    val names = measurementNames.filter { n =>
      q.fromRegex.map(re => re.r.findFirstIn(n).isDefined)
        .getOrElse(if (q.fromList.nonEmpty) q.fromList.contains(n)
        else n == q.measurement)
    }
    val cat = names.map(n => n -> prunedFrame(n, q))
    val result = graft.influxql.InfluxQL.runCatalog(spark, cat, query)
    // multi-source is a property of the PARSED query shape, never sniffed
    // from the result columns — a single-measurement source with a user
    // column named 'measurement' must not be mistaken for a union frame
    val multi = q.fromRegex.isDefined || q.fromList.nonEmpty
    q.into.foreach { target =>
      graft.influxql.InfluxQL.backrefPrefix(target) match {
        case Some(prefix) if multi =>
          // fan-out writes all read the SAME union result — persist it so
          // N targets cost one source pass, not N+1
          result.persist()
          try {
            // matched source names: bounded by the measurement count
            val hit = result.select("measurement").distinct()
              .collect().map(_.getString(0)).sorted
            hit.foreach { nm =>
              append(s"$prefix.$nm",
                result.filter(col("measurement") === nm).drop("measurement"))
            }
          } finally result.unpersist()
        case Some(prefix) => append(s"$prefix.${q.measurement}", result)
        case None => append(target,
          if (multi) result.drop("measurement") else result)
      }
    }
    result
  }

  /** Small-file compaction: rewrite each day partition of a measurement
    * into `filesPerDay` files. The reference accumulates thousands of tiny
    * per-site daily writes (one InfluxDB batch per CSV drain); on parquet
    * that becomes the small-file problem — footer-per-file planning costs
    * dominate once files ≪ row groups. Content is preserved exactly; only
    * the file layout changes. Returns (day, files_before, files_after).
    *
    * Scale shape: ONE distributed job rewrites every over-fragmented day
    * (repartitioned so each day lands in exactly `filesPerDay` files), then
    * each day swaps in with metadata-only renames — the [[dropSeries]]
    * pattern; a per-day Spark-job loop would serialize into #days driver
    * round-trips, the pattern that dies at a year of partitions.
    *
    * Crash safety: staged days live under the `.dropseries_tmp` /
    * `.compact_`/`.old_` convention, every interrupted state healed by
    * [[recoverCompaction]] (run at the start of every compact). */
  def compact(measurement: String, filesPerDay: Int = 1): Seq[(String, Int, Int)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path(measurement)).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
    if (!fs.exists(rootPath)) return Seq.empty
    recoverCompaction(measurement)
    def countFiles(day: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(rootPath, s"day=$day"))
        .count(f => f.isFile && !f.getPath.getName.startsWith(".")
          && !f.getPath.getName.startsWith("_"))
    val days = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map(_.getPath.getName.stripPrefix("day=")).sorted
    val before = days.map(d => d -> countFiles(d)).toMap
    val toCompact = days.filter(before(_) > filesPerDay)
    if (toCompact.nonEmpty) {
      // (day [, salt]) repartition → each day writes exactly filesPerDay
      // files in the single staged job
      val layout: DataFrame => DataFrame =
        if (filesPerDay == 1) _.repartition(col("day"))
        else _.repartition(col("day"),
          pmod(hash(col("time")), lit(filesPerDay)))
      rewriteDays(measurement, fs, rootPath, toCompact, lit(true), layout)
    }
    days.map(d => (d, before(d), countFiles(d)))
  }

  private val DeleteRe =
    """(?i)^\s*DELETE\s+FROM\s+"?(\w+)"?\s+WHERE\s+time\s*(<=|<|>=|>)\s*'([^']*)'\s*;?\s*$""".r
  private val DeleteAllRe =
    """(?i)^\s*DELETE\s+FROM\s+"?(\w+)"?\s*;?\s*$""".r
  // tag + time conjunction, both orders (InfluxDB 1.x supports tag-scoped
  // deletes — the decommission-a-site-but-keep-recent-audit-data shape)
  private val DeleteTagTimeRe =
    ("""(?i)^\s*DELETE\s+FROM\s+"?(\w+)"?\s+WHERE\s+"?(\w+)"?\s*=\s*'([^']*)'""" +
      """\s+AND\s+time\s*(<=|<|>=|>)\s*'([^']*)'\s*;?\s*$""").r
  private val DeleteTimeTagRe =
    ("""(?i)^\s*DELETE\s+FROM\s+"?(\w+)"?\s+WHERE\s+time\s*(<=|<|>=|>)\s*'([^']*)'""" +
      """\s+AND\s+"?(\w+)"?\s*=\s*'([^']*)'\s*;?\s*$""").r

  /** InfluxQL `DELETE FROM <m> WHERE time <op> '<ts>'` — the management
    * statement behind the reference's delete-oldest-until-enough-space loop
    * (memory_manager.py:8-17). Day partitions entirely inside the deleted
    * range are DROPPED (a metadata operation — no data read); only the one
    * boundary day containing the bound is rewritten, through the same
    * crash-safe swap as [[compact]]. Returns (dropped days, rewritten days).
    *
    * The tag-scoped form `DELETE FROM m WHERE <tag> = 'v' AND time <op> t`
    * (either conjunct order) removes one series within a time range — a
    * site decommission that must keep recent data for audit. Days in the
    * range still hold other series, so nothing can metadata-drop: every
    * affected day (located by a tag-pushdown scan) is rewritten to its
    * survivors in ONE distributed job and swapped in crash-safe, the
    * [[dropSeries]] pattern. Returns (Nil, rewritten-or-dropped days). */
  def deleteWhere(statement: String): (Seq[String], Seq[String]) = statement match {
    case DeleteAllRe(measurement) =>
      // InfluxQL `DELETE FROM m` with no WHERE: drop every point but KEEP
      // the measurement (unlike DROP MEASUREMENT) — all-metadata deletes
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path(measurement)).resolve("/"),
        spark.sparkContext.hadoopConfiguration)
      val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
      if (!fs.exists(rootPath)) return (Seq.empty, Seq.empty)
      recoverCompaction(measurement)
      val days = fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(_.getPath.getName.stripPrefix("day=")).sorted
      days.foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(rootPath, s"day=$d"), true))
      (days, Seq.empty)
    case DeleteTagTimeRe(measurement, tag, v, op, ts) =>
      (Seq.empty, deleteSeriesWindow(measurement, tag, v, op, ts))
    case DeleteTimeTagRe(measurement, op, ts, tag, v) =>
      (Seq.empty, deleteSeriesWindow(measurement, tag, v, op, ts))
    case DeleteRe(measurement, op, ts) =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path(measurement)).resolve("/"),
        spark.sparkContext.hadoopConfiguration)
      val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
      if (!fs.exists(rootPath)) return (Seq.empty, Seq.empty)
      recoverCompaction(measurement)
      val boundDay = ts.take(10)
      val days = fs.listStatus(rootPath).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
        .map(_.getPath.getName.stripPrefix("day="))
      val fullyDeleted = days.filter(d =>
        if (op.startsWith("<")) d < boundDay else d > boundDay)
      fullyDeleted.foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(rootPath, s"day=$d"), true))
      // the boundary day keeps the rows NOT matched by the predicate
      val rewritten = days.filter(_ == boundDay).map { d =>
        val dayPath = new org.apache.hadoop.fs.Path(rootPath, s"day=$d")
        val keepPred = op match {
          case "<"  => col("time") >= to_timestamp(lit(ts))
          case "<=" => col("time") > to_timestamp(lit(ts))
          case ">"  => col("time") <= to_timestamp(lit(ts))
          case ">=" => col("time") < to_timestamp(lit(ts))
        }
        swapDay(fs, rootPath, d,
          spark.read.parquet(dayPath.toString).filter(keepPred))
        d
      }
      (fullyDeleted, rewritten)
    case _ => throw new IllegalArgumentException(
      s"not a supported DELETE statement: $statement")
  }

  /** Rewrite one day partition to `kept` through the crash-safe two-rename
    * swap shared by [[compact]], [[deleteWhere]] and [[dropSeries]]: write
    * to `.compact_<day>`, rename the live dir to `.old_<day>`, rename the
    * rewrite into place, then delete the spare. Every interrupted state is
    * healed by [[recoverCompaction]]. */
  private def swapDay(fs: org.apache.hadoop.fs.FileSystem,
    rootPath: org.apache.hadoop.fs.Path, day: String, kept: DataFrame): Unit = {
    val dayPath = new org.apache.hadoop.fs.Path(rootPath, s"day=$day")
    val tmp = new org.apache.hadoop.fs.Path(rootPath, s".compact_$day")
    val old = new org.apache.hadoop.fs.Path(rootPath, s".old_$day")
    kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.rename(dayPath, old)
    fs.rename(tmp, dayPath)
    fs.delete(old, true)
  }

  private val DropSeriesRe =
    ("""(?i)^\s*DROP\s+SERIES\s+FROM\s+"?(\w+)"?""" +
      """\s+WHERE\s+"?(\w+)"?\s*=\s*'([^']*)'\s*;?\s*$""").r

  /** InfluxQL `DROP SERIES FROM <m> WHERE <tag> = '<v>'` — removes every
    * point of the matching series across all time: the decommissioned-site
    * workflow (the reference retires dataloggers per building; DELETE only
    * trims by time). Only day partitions that actually contain the series
    * are touched — located by a tag-pushdown scan (parquet row-group stats
    * skip non-matching files). The survivors of every affected day are
    * rewritten in ONE distributed job (partitioned by day), then each day
    * is swapped in with the crash-safe rename pair — per-day Spark jobs
    * would serialize into #days driver round-trips, the exact pattern that
    * dies at a year of partitions. A day whose every row matched simply
    * drops (metadata delete). Returns the affected days. */
  def dropSeries(statement: String): Seq[String] = statement match {
    case DropSeriesRe(measurement, tag, v) =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path(measurement)).resolve("/"),
        spark.sparkContext.hadoopConfiguration)
      val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
      if (!fs.exists(rootPath)) return Seq.empty
      recoverCompaction(measurement)
      val affected = readRaw(measurement).filter(col(tag) === v)
        .select("day").distinct().collect().map(_.getString(0)).toSeq.sorted
      if (affected.isEmpty) return Seq.empty
      rewriteDays(measurement, fs, rootPath, affected,
        col(tag) =!= v || col(tag).isNull)
      affected
    case _ => throw new IllegalArgumentException(
      s"not a supported DROP SERIES statement: $statement")
  }

  /** Tag-scoped, time-bounded delete (the [[deleteWhere]] tag+time form):
    * rewrite every day holding matching rows to its survivors. Affected
    * days are located with the day-partition prune FIRST (only days the
    * time bound can reach are scanned for the tag). */
  private def deleteSeriesWindow(measurement: String, tag: String, v: String,
    op: String, ts: String): Seq[String] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path(measurement)).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
    if (!fs.exists(rootPath)) return Seq.empty
    recoverCompaction(measurement)
    val bound = to_timestamp(lit(ts))
    val timePred = op match {
      case "<"  => col("time") < bound
      case "<=" => col("time") <= bound
      case ">"  => col("time") > bound
      case ">=" => col("time") >= bound
    }
    val boundDay = ts.take(10)
    val dayPred =
      if (op.startsWith("<")) col("day") <= boundDay else col("day") >= boundDay
    val affected = readRaw(measurement).filter(dayPred)
      .filter(col(tag) === v && timePred)
      .select("day").distinct().collect().map(_.getString(0)).toSeq.sorted
    if (affected.isEmpty) return Seq.empty
    // survivors: other series, null-tag rows, and the series outside the
    // time bound (spelled null-safely — !(tag = v) drops null tags)
    rewriteDays(measurement, fs, rootPath, affected,
      col(tag).isNull || col(tag) =!= v || !timePred)
    affected
  }

  /** One distributed job + per-day crash-safe swaps, shared by
    * [[dropSeries]] and the tag-scoped [[deleteWhere]]: write the
    * survivors (`keep`) of every affected day, laid out day-partitioned,
    * under `.dropseries_tmp`, then promote each rewritten day through the
    * `.compact_`/`.old_` rename convention [[recoverCompaction]] heals.
    * A day with no surviving rows drops entirely (metadata delete). A
    * crash mid-swap-loop is healed by recovery: staged days still under
    * `.dropseries_tmp` (the job's `_SUCCESS` marker proves them complete)
    * are promoted; only the no-survivor days not yet dropped need a
    * statement rerun, which recomputes them. */
  private def rewriteDays(measurement: String,
    fs: org.apache.hadoop.fs.FileSystem,
    rootPath: org.apache.hadoop.fs.Path,
    affected: Seq[String], keep: Column,
    layout: DataFrame => DataFrame = identity): Unit = {
    val tmpRoot = new org.apache.hadoop.fs.Path(rootPath, ".dropseries_tmp")
    if (fs.exists(tmpRoot)) fs.delete(tmpRoot, true)
    layout(readRaw(measurement)
      .filter(col("day").isin(affected: _*)) // partition-prunes the scan
      .filter(keep))
      .write.mode(SaveMode.Overwrite).partitionBy("day")
      .parquet(tmpRoot.toString)
    affected.foreach { d =>
      def p(n: String) = new org.apache.hadoop.fs.Path(rootPath, n)
      val tmpDay = new org.apache.hadoop.fs.Path(tmpRoot, s"day=$d")
      if (fs.exists(tmpDay)) {
        // clear stale swap artifacts first — Hadoop rename onto an
        // existing directory either fails or nests the source inside it —
        // and assert each rename so a failed swap surfaces instead of
        // silently corrupting the day layout
        if (fs.exists(p(s".compact_$d"))) fs.delete(p(s".compact_$d"), true)
        if (fs.exists(p(s".old_$d"))) fs.delete(p(s".old_$d"), true)
        require(fs.rename(tmpDay, p(s".compact_$d")),
          s"rename failed: $tmpDay -> .compact_$d")
        require(fs.rename(p(s"day=$d"), p(s".old_$d")),
          s"rename failed: day=$d -> .old_$d")
        require(fs.rename(p(s".compact_$d"), p(s"day=$d")),
          s"rename failed: .compact_$d -> day=$d")
        fs.delete(p(s".old_$d"), true)
      } else {
        // every row of the day failed `keep`
        fs.delete(p(s"day=$d"), true)
      }
    }
    fs.delete(tmpRoot, true)
  }

  private val DropRe =
    """(?i)^\s*DROP\s+MEASUREMENT\s+"?(\w+)"?\s*;?\s*$""".r

  /** InfluxQL `DROP MEASUREMENT <m>` — removes the measurement directory
    * entirely (the reference wipes whole series when a site is
    * decommissioned). Returns true if anything was deleted. */
  def dropMeasurement(statement: String): Boolean = statement match {
    case DropRe(measurement) =>
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path(measurement)).resolve("/"),
        spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path(measurement)), true)
    case _ => throw new IllegalArgumentException(
      s"not a supported DROP statement: $statement")
  }

  /** Heal interrupted [[compact]] swaps. Cases, by what survived a crash:
    *  - `.old_<day>` and no `day=<day>`: crashed between the two renames —
    *    promote `.compact_<day>` if complete, else restore the old dir.
    *  - `.old_<day>` and `day=<day>`: crashed before the old-dir delete —
    *    the live dir is the compacted copy; drop the spare.
    *  - `.compact_<day>` and `day=<day>`: crashed before/during the swap —
    *    the live dir is intact; drop the (possibly partial) rewrite. */
  def recoverCompaction(measurement: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path(measurement)).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
    if (!fs.exists(rootPath)) return
    val entries = fs.listStatus(rootPath).toSeq.filter(_.isDirectory)
    def p(name: String) = new org.apache.hadoop.fs.Path(rootPath, name)
    entries.map(_.getPath.getName).foreach {
      case n if n.startsWith(".old_") =>
        val day = n.stripPrefix(".old_")
        val live = p(s"day=$day")
        val tmp = p(s".compact_$day")
        if (!fs.exists(live)) {
          // a parquet write that finished has a _SUCCESS marker
          if (fs.exists(tmp) && fs.exists(
              new org.apache.hadoop.fs.Path(tmp, "_SUCCESS"))) {
            fs.rename(tmp, live)
          } else {
            if (fs.exists(tmp)) fs.delete(tmp, true)
            fs.rename(p(n), live)
          }
        }
        if (fs.exists(p(n))) fs.delete(p(n), true)
      case n if n.startsWith(".compact_") =>
        val day = n.stripPrefix(".compact_")
        if (fs.exists(p(s"day=$day"))) fs.delete(p(n), true)
      case ".dropseries_tmp" =>
        val tmpRoot = p(".dropseries_tmp")
        if (fs.exists(new org.apache.hadoop.fs.Path(tmpRoot, "_SUCCESS"))) {
          // the rewrite job completed, so the crash hit the swap loop:
          // already-swapped days were renamed OUT of the staging dir —
          // whatever day= dirs remain are complete survivors not yet
          // promoted. Finish their swaps instead of discarding them
          // (re-promoting a day that equals its staged copy is harmless).
          // Only fully-deleted days (no survivors staged, not yet dropped)
          // are left over; a statement rerun recomputes and drops them.
          fs.listStatus(tmpRoot).toSeq
            .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
            .foreach { s =>
              val day = s.getPath.getName.stripPrefix("day=")
              val live = p(s"day=$day")
              val stage = p(s".compact_$day")
              val old = p(s".old_$day")
              // a crash can leave stale .compact_/.old_ twins of the same
              // day (the outer listing's case order is unspecified) —
              // clear them before renaming, and assert every rename:
              // Hadoop rename onto an existing dir fails or nests
              if (fs.exists(stage)) fs.delete(stage, true)
              require(fs.rename(s.getPath, stage),
                s"rename failed: ${s.getPath} -> $stage")
              if (fs.exists(live)) {
                if (fs.exists(old)) fs.delete(old, true)
                require(fs.rename(live, old), s"rename failed: $live -> $old")
              }
              require(fs.rename(stage, live), s"rename failed: $stage -> $live")
              fs.delete(old, true)
            }
        }
        // crash before the job finished (no _SUCCESS): live days are
        // untouched, the partial rewrite is safely discarded
        fs.delete(tmpRoot, true)
      case _ => ()
    }
  }

  /** Byte-budget retention plan over REAL on-disk partition sizes — the
    * reference's actual contract (memory_manager.py:13-16 frees disk bytes,
    * oldest-first, until the free-space requirement holds; row counts are
    * only a proxy). Day partition sizes come from a Hadoop `FileSystem`
    * listing (works on any FS Spark can reach, not just local disk); the
    * driver-side listing is one status call per day partition — bounded by
    * #days, not data volume. Returns (day, bytes, cum_bytes, keep) with
    * newest-first cumulative bytes; a day is kept while the running total
    * stays within `byteBudget`. */
  def planRetentionBytes(measurement: String, byteBudget: Long): Seq[(String, Long, Long, Boolean)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path(measurement)).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    val rootPath = new org.apache.hadoop.fs.Path(path(measurement))
    if (!fs.exists(rootPath)) return Seq.empty
    val days = fs.listStatus(rootPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("day="))
      .map(s => (s.getPath.getName.stripPrefix("day="),
        fs.getContentSummary(s.getPath).getLength))
      .sortBy(_._1)(Ordering[String].reverse) // newest first
    days.scanLeft(("", 0L, 0L, true)) { case ((_, _, cum, _), (day, bytes)) =>
      (day, bytes, cum + bytes, cum + bytes <= byteBudget)
    }.drop(1)
  }

  /** Enforce [[planRetentionBytes]]: delete the day partitions whose
    * cumulative (newest-first) size exceeds the budget; returns dropped
    * days, oldest of the kept data surviving — mirrors the reference's
    * delete-oldest-until-enough-space loop (memory_manager.py:8-17). */
  def enforceRetentionBytes(measurement: String, byteBudget: Long): Seq[String] = {
    val drop = planRetentionBytes(measurement, byteBudget)
      .collect { case (day, _, _, false) => day }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path(measurement)).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    drop.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${path(measurement)}/day=$d"), true)
    }
    drop
  }

  /** Retention: keep the newest day partitions whose cumulative row count
    * stays within `rowBudget`; returns the days dropped. */
  def enforceRetention(measurement: String, rowBudget: Long): Seq[String] = {
    val counts = readRaw(measurement)
      .groupBy("day").count()
      .withColumn("cum", sum("count").over(
        Window.orderBy(col("day").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val drop = counts.filter(col("cum") > rowBudget)
      .select("day").collect().map(_.getString(0)).toSeq
    // Hadoop FS, not java.io.File — the deletion must work on any store
    // Spark can read (HDFS/S3A/...), same as the byte-budget sibling
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path(measurement)).resolve("/"),
      spark.sparkContext.hadoopConfiguration)
    drop.foreach { d =>
      fs.delete(new org.apache.hadoop.fs.Path(s"${path(measurement)}/day=$d"), true)
    }
    drop
  }
}
