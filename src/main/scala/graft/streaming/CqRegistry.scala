package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Managed continuous-query lifecycle — the half of the reference's
  * cron-job replacement that outlives a single run: CREATE registers a CQ,
  * `SHOW CONTINUOUS QUERIES` / `DROP CONTINUOUS QUERY` manage the registry,
  * and [[run]] executes a registered CQ with a STABLE per-CQ checkpoint so a
  * re-run RESUMES — Structured Streaming's file-source log skips every file
  * already processed, and the aggregation state restores from the state
  * store. (The reference runs its downsampling scripts from cron with no
  * dedup of reprocessed input; checkpointed resume is the Spark-native
  * upgrade of that contract.)
  *
  * Execution shape: the CQ body translates through the same
  * [[graft.influxql.InfluxQL.streamingAggregate]] as the one-shot
  * continuous-query op — tumbling window + tags in Complete mode (InfluxDB
  * CQs recompute affected buckets; Complete re-emits the maintained result,
  * no watermark race on the final window) — and `foreachBatch` overwrites
  * the INTO target's parquet dir with the updated result. State is bounded
  * by the number of open windows × series, not input rows.
  */
class CqRegistry(spark: SparkSession, root: String) {
  import CqRegistry._
  import spark.implicits._

  /** name → (db, full CREATE statement text). */
  private val cqs = mutable.LinkedHashMap[String, (String, String)]()

  /** Rows read by the most recent [[run]] — exposed so callers (and the
    * resume spec) can observe that a restart consumed only NEW input. */
  @volatile var lastRunInputRows: Long = -1L

  def create(stmt: String): Unit = synchronized {
    val (name, db, _) = graft.influxql.InfluxQL.parseCq(stmt)
    if (cqs.contains(name))
      throw new IllegalArgumentException(s"continuous query '$name' exists")
    cqs(name) = (db, stmt.trim)
  }

  def drop(name: String): Unit = synchronized {
    if (cqs.remove(name).isEmpty)
      throw new IllegalArgumentException(s"unknown continuous query '$name'")
  }

  def show: DataFrame =
    synchronized(cqs.toSeq.map { case (n, (db, stmt)) => (db, n, stmt) })
      .sortBy(t => (t._1, t._2)).toDF("db", "name", "query")

  /** The management statements as one front door. */
  def statement(q: String): DataFrame = q match {
    case ShowCqRe() => show
    case DropCqRe(name, _) => drop(name); show.limit(0)
    case _ if q.trim.toUpperCase.startsWith("CREATE CONTINUOUS") =>
      create(q); show.limit(0)
    case _ => throw new IllegalArgumentException(
      s"not a continuous-query statement: $q")
  }

  /** Execute a registered CQ over `stream` (an unbounded frame whose event
    * time column is `time`), draining available input (AvailableNow) and
    * resuming from the CQ's checkpoint. The INTO target parquet dir holds
    * the maintained result and is returned re-read; a run that finds no new
    * input leaves it untouched (and processes zero rows). */
  def run(name: String, stream: DataFrame): DataFrame = {
    val (db, stmt) = synchronized(cqs.getOrElse(name,
      throw new IllegalArgumentException(s"unknown continuous query '$name'")))
    val (_, _, body) = graft.influxql.InfluxQL.parseCq(stmt)
    val target = body.into.getOrElse(throw new IllegalArgumentException(
      s"continuous query '$name' has no INTO target"))
    val out = s"$root/$db/$target"
    val ckpt = s"$root/$db/.cq_ckpt_$name"
    val agged = graft.influxql.InfluxQL.streamingAggregate(stream, body, stmt)
    val q = agged.writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("overwrite").parquet(out)
        ()
      }
      .start()
    q.awaitTermination()
    lastRunInputRows = q.recentProgress.map(_.numInputRows).sum
    spark.read.parquet(out)
  }

  /** As [[run]], but the INTO target lands in a [[graft.store.MeasurementStore]]
    * measurement instead of a bare parquet dir — the continuous path writes
    * the SAME day-partitioned, upsert-merged layout the batch InfluxQL front
    * door reads, so a dashboard queries one measurement regardless of which
    * engine mode produced it. Each micro-batch upserts the maintained
    * result on (time, tags) with the batch id as the version — re-emission
    * of a bucket last-write-wins, and a resumed run (same checkpoint) stays
    * idempotent. */
  def runIntoStore(name: String, stream: DataFrame,
    store: graft.store.MeasurementStore): DataFrame = {
    val (db, stmt) = synchronized(cqs.getOrElse(name,
      throw new IllegalArgumentException(s"unknown continuous query '$name'")))
    val (_, _, body) = graft.influxql.InfluxQL.parseCq(stmt)
    val target = body.into.getOrElse(throw new IllegalArgumentException(
      s"continuous query '$name' has no INTO target"))
    val ckpt = s"$root/$db/.cq_ckpt_$name"
    val keys = "time" +: body.groupTags
    val agged = graft.influxql.InfluxQL.streamingAggregate(stream, body, stmt)
    val q = agged.writeStream
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        store.upsert(target,
          batch.withColumn("__cq_version", org.apache.spark.sql.functions.lit(batchId)),
          keys, "__cq_version")
        ()
      }
      .start()
    q.awaitTermination()
    lastRunInputRows = q.recentProgress.map(_.numInputRows).sum
    store.read(target)
  }
}

object CqRegistry {
  private val ShowCqRe =
    """(?i)^\s*SHOW\s+CONTINUOUS\s+QUERIES\s*;?\s*$""".r
  private val DropCqRe =
    """(?i)^\s*DROP\s+CONTINUOUS\s+QUERY\s+"?(\w+)"?(?:\s+ON\s+"?(\w+)"?)?\s*;?\s*$""".r
}
