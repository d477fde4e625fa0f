package graft.streaming

import scala.collection.mutable
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger

/** Managed continuous-query lifecycle — the half of the reference's
  * cron-job replacement that outlives a single run: CREATE registers a CQ,
  * `SHOW CONTINUOUS QUERIES` / `DROP CONTINUOUS QUERY` manage the registry
  * (keyed by (db, name), matching InfluxDB's per-database CQ namespace),
  * and [[run]] executes a registered CQ with a STABLE per-CQ checkpoint so a
  * re-run RESUMES — Structured Streaming's file-source log skips every file
  * already processed, and the aggregation state restores from the state
  * store. (The reference runs its downsampling scripts from cron with no
  * dedup of reprocessed input; checkpointed resume is the Spark-native
  * upgrade of that contract.)
  *
  * Execution shape: the CQ body translates through the same
  * [[graft.influxql.InfluxQL.streamingAggregate]] as the one-shot
  * continuous-query op, but INCREMENTALLY — `withWatermark(time,
  * watermarkLag)` + update output mode, so each micro-batch emits only the
  * buckets the batch CHANGED and the state store evicts windows older than
  * the lag. State and per-batch write cost are bounded by OPEN windows ×
  * series (windows within the lag), not by the CQ's total lifetime — the
  * property that keeps a long-running deployment flat at 100 TB. The
  * trade, which is also InfluxDB's own CQ contract: input arriving later
  * than the lag is dropped by the aggregation; backfill older than the lag
  * goes through a manual batch `SELECT ... INTO` run instead.
  *
  * `watermarkLag` is the registry-default lateness/freshness policy; a CQ
  * created with `RESAMPLE FOR <d>` carries its own and overrides it. The
  * default ("1 hour") suits a live deployment; a historical backfill drain
  * (like the correctness fixture, which replays days of history in one
  * run) passes a lag covering the replayed span so no replayed bucket is
  * treated as late.
  */
class CqRegistry(spark: SparkSession, root: String,
  watermarkLag: String = "1 hour") {
  import CqRegistry._
  import spark.implicits._

  /** (db, name) → full CREATE statement text. */
  private val cqs = mutable.LinkedHashMap[(String, String), String]()

  /** Rows read by the most recent [[run]] — exposed so callers (and the
    * resume spec) can observe that a restart consumed only NEW input. */
  @volatile var lastRunInputRows: Long = -1L

  /** Aggregation-state rows held after the most recent [[run]] — exposed so
    * the bounded-state spec can assert eviction: with a watermark this is
    * the open-window count × series, NOT total windows ever seen. */
  @volatile var lastRunStateRows: Long = -1L

  def create(stmt: String): Unit = synchronized {
    val (name, db, _) = graft.influxql.InfluxQL.parseCq(stmt)
    if (cqs.contains((db, name)))
      throw new IllegalArgumentException(
        s"continuous query '$name' exists on database '$db'")
    cqs((db, name)) = stmt.trim
  }

  /** Drop by name; `onDb` scopes to one database (the ON clause). A bare
    * name that exists on several databases is ambiguous and fails loudly. */
  def drop(name: String, onDb: Option[String] = None): Unit = synchronized {
    val hits = cqs.keys.filter(k =>
      k._2 == name && onDb.forall(_ == k._1)).toSeq
    if (hits.isEmpty)
      throw new IllegalArgumentException(s"unknown continuous query '$name'" +
        onDb.map(db => s" on database '$db'").getOrElse(""))
    if (hits.size > 1)
      throw new IllegalArgumentException(
        s"continuous query '$name' exists on databases " +
          s"${hits.map(_._1).sorted.mkString(", ")}; use ON <db>")
    cqs.remove(hits.head)
  }

  def show: DataFrame =
    synchronized(cqs.toSeq.map { case ((db, n), stmt) => (db, n, stmt) })
      .sortBy(t => (t._1, t._2)).toDF("db", "name", "query")

  /** The management statements as one front door. */
  def statement(q: String): DataFrame = q match {
    case ShowCqRe() => show
    case DropCqRe(name, db) => drop(name, Option(db)); show.limit(0)
    case _ if q.trim.toUpperCase.startsWith("CREATE CONTINUOUS") =>
      create(q); show.limit(0)
    case _ => throw new IllegalArgumentException(
      s"not a continuous-query statement: $q")
  }

  private def resolve(name: String): (String, String) = synchronized {
    val hits = cqs.keys.filter(_._2 == name).toSeq
    if (hits.isEmpty)
      throw new IllegalArgumentException(s"unknown continuous query '$name'")
    if (hits.size > 1)
      throw new IllegalArgumentException(
        s"continuous query '$name' exists on databases " +
          s"${hits.map(_._1).sorted.mkString(", ")}")
    (hits.head._1, cqs(hits.head))
  }

  /** The CQ's own RESAMPLE FOR duration wins over the registry default:
    * a CQ statement carries its lateness/recompute policy, as in
    * InfluxDB. */
  private def lagOf(forDur: Option[String]): String =
    forDur.map(d =>
      s"${graft.influxql.InfluxQL.durationUs(d)} microseconds")
      .getOrElse(watermarkLag)

  private def fs(p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** CQs whose [[run]]/[[runIntoStore]] is currently executing. Two
    * concurrent runs of one CQ would share a checkpoint dir and a target —
    * undefined behavior in Structured Streaming — so the second fails
    * loudly instead. In-registry scope: cross-PROCESS exclusion is the
    * deployment scheduler's job (one registry per driver, like the
    * reference's single cron host). */
  private val running = java.util.concurrent.ConcurrentHashMap
    .newKeySet[(String, String)]()

  private[graft] def guarded[A](db: String, name: String)(body: => A): A = {
    if (!running.add((db, name)))
      throw new IllegalStateException(
        s"continuous query '$name' on database '$db' is already running — " +
          "concurrent runs would share its checkpoint; wait for the " +
          "current run to finish")
    try body finally running.remove((db, name))
  }

  private def finishRun(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination()
    lastRunInputRows = q.recentProgress.map(_.numInputRows).sum
    lastRunStateRows = Option(q.lastProgress)
      .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
  }

  /** Execute a registered CQ over `stream` (an unbounded frame whose event
    * time column is `time`), draining available input (AvailableNow) and
    * resuming from the CQ's checkpoint. The INTO target parquet dir holds
    * the maintained result: each micro-batch MERGES only its changed
    * buckets (keyed on time + group tags) via a staged rewrite-and-swap —
    * update mode never re-emits the unchanged remainder, so the per-batch
    * Spark work is sized to the delta. (The rewrite itself is output-sized,
    * inherent to a flat parquet dir; the scale tier is [[runIntoStore]],
    * whose day-pruned MERGE rewrites only touched partitions.) A run that
    * finds no new input processes zero rows and leaves the target
    * untouched; if the target has never been written, an EMPTY frame with
    * the aggregate schema comes back instead of an error. */
  def run(name: String, stream: DataFrame): DataFrame = {
    val (db, stmt) = resolve(name)
    guarded(db, name) {
    val (_, _, body, _, forDur) =
      graft.influxql.InfluxQL.parseCqResample(stmt)
    val target = body.into.getOrElse(throw new IllegalArgumentException(
      s"continuous query '$name' has no INTO target"))
    val out = s"$root/$db/$target"
    val ckpt = s"$root/$db/.cq_ckpt_$name"
    val keys = "time" +: body.groupTags
    healSwap(out)
    val agged = graft.influxql.InfluxQL
      .streamingAggregate(stream, body, stmt, Some(lagOf(forDur)))
    val q = agged.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoDir(batch, out, keys)
        ()
      }
      .start()
    finishRun(q)
    if (fs(out).exists(new Path(out))) spark.read.parquet(out)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], agged.schema)
    }
  }

  /** Merge `batch` (the changed buckets) into the parquet dir `out` on
    * `keys` — the shared staged swap sink ([[MergeSink.mergeOnKeys]]). */
  private def mergeIntoDir(batch: DataFrame, out: String,
    keys: Seq[String]): Unit =
    MergeSink.mergeOnKeys(spark, batch, out, keys)

  private def healSwap(out: String): Unit = MergeSink.healSwap(spark, out)

  /** As [[run]], but the INTO target lands in a [[graft.store.MeasurementStore]]
    * measurement instead of a bare parquet dir — the continuous path writes
    * the SAME day-partitioned, upsert-merged layout the batch InfluxQL front
    * door reads, so a dashboard queries one measurement regardless of which
    * engine mode produced it. Each micro-batch upserts ONLY its changed
    * buckets on (time, tags), with the batch id as a synthesized version
    * that is dropped before the partitioned write (the stored schema
    * matches a batch-produced measurement) — re-emission of a bucket
    * last-write-wins, a resumed run (same checkpoint) stays idempotent, and
    * the store MERGE rewrites only the day partitions the delta touches. */
  def runIntoStore(name: String, stream: DataFrame,
    store: graft.store.MeasurementStore,
    subscriptions: Option[graft.influxql.MeasurementCatalog] = None,
    rp: String = "autogen"): DataFrame = {
    val (db, stmt) = resolve(name)
    guarded(db, name) {
    val (_, _, body, _, forDur) =
      graft.influxql.InfluxQL.parseCqResample(stmt)
    val target = body.into.getOrElse(throw new IllegalArgumentException(
      s"continuous query '$name' has no INTO target"))
    val ckpt = s"$root/$db/.cq_ckpt_$name"
    val keys = "time" +: body.groupTags
    val agged = graft.influxql.InfluxQL
      .streamingAggregate(stream, body, stmt, Some(lagOf(forDur)))
    val q = agged.writeStream
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val versioned = batch.withColumn("__cq_version",
          org.apache.spark.sql.functions.lit(batchId))
        // resolve the subscription targets ONCE per micro-batch: the
        // persist decision and the forward loop must see the same
        // snapshot, or a subscription registered between two samples
        // makes the tee recompute an unpersisted delta
        val dests = subscriptions
          .map(_.subscriptionTargets(db, rp)).getOrElse(Nil)
        // cache the delta once: the store MERGE and each subscription tee
        // all consume the same micro-batch
        val shared = if (dests.nonEmpty) versioned.persist() else versioned
        try {
          store.upsert(target, shared, keys, "__cq_version",
            dropVersion = true)
          // subscription write-forwarding: the same delta, version column
          // INCLUDED, appends to each registered file destination — the
          // subscriber's last-write-wins collapse key (raw write stream,
          // not merged store state: the Kapacitor contract)
          subscriptions.foreach(
            _.forwardWrite(db, rp, target, shared, Some(dests)))
        } finally if (shared ne versioned) { shared.unpersist(); () }
        ()
      }
      .start()
    finishRun(q)
    store.read(target)
    }
  }
}

object CqRegistry {
  private val ShowCqRe =
    """(?i)^\s*SHOW\s+CONTINUOUS\s+QUERIES\s*;?\s*$""".r
  private val DropCqRe =
    """(?i)^\s*DROP\s+CONTINUOUS\s+QUERY\s+"?(\w+)"?(?:\s+ON\s+"?(\w+)"?)?\s*;?\s*$""".r
}
