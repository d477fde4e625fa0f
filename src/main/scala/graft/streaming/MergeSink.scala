package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Staged keyed MERGE of streaming micro-batch deltas into a flat parquet
  * dir — the update-mode sink behind [[CqRegistry.run]] and the
  * incremental demo streams in [[StreamingOps]]. Update mode emits only
  * the buckets a micro-batch CHANGED, so the Spark work per trigger is
  * sized to the delta; the merge keeps unchanged rows via anti-join and
  * swaps the rewritten dir in atomically (write-tmp → rename), so a
  * reader never sees a half-written target and a crash leaves a state
  * [[healSwap]] completes. (The rewrite itself is output-sized — inherent
  * to a flat parquet dir; the scale tier is
  * [[graft.store.MeasurementStore.upsert]], whose day-pruned MERGE
  * rewrites only touched partitions.) */
private[graft] object MergeSink {
  private def fs(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Merge `batch` into `out`, replacing the existing rows `stale`
    * selects (given (existing, delta)) with the batch rows. AvailableNow
    * drains end with an empty watermark-commit batch; an empty delta must
    * not rewrite (or first-create) the target. */
  def merge(spark: SparkSession, batch: DataFrame, out: String)(
    stale: (DataFrame, DataFrame) => DataFrame): Unit = {
    if (batch.isEmpty) return
    val hfs = fs(spark, out)
    val outP = new Path(out)
    if (!hfs.exists(outP)) {
      // first-ever write is staged too: a crash mid-write leaves only a
      // .cq_tmp without _SUCCESS (discarded by healSwap), a crash after
      // the write but before the rename leaves .cq_tmp WITH _SUCCESS and
      // no live dir (promoted by healSwap) — every target mutation goes
      // through the same _SUCCESS-gated swap/heal protocol
      val tmp = new Path(out + ".cq_tmp")
      if (hfs.exists(tmp)) hfs.delete(tmp, true)
      batch.write.parquet(tmp.toString)
      require(hfs.rename(tmp, outP), s"swap failed: $tmp -> $outP")
    } else {
      val tmp = new Path(out + ".cq_tmp")
      val old = new Path(out + ".cq_old")
      if (hfs.exists(tmp)) hfs.delete(tmp, true)
      val b = batch.persist()
      try {
        val existing = spark.read.parquet(out)
        stale(existing, b)
          .unionByName(b)
          .write.parquet(tmp.toString)
      } finally b.unpersist()
      if (hfs.exists(old)) hfs.delete(old, true)
      require(hfs.rename(outP, old), s"swap failed: $outP -> $old")
      require(hfs.rename(tmp, outP), s"swap failed: $tmp -> $outP")
      hfs.delete(old, true)
    }
  }

  /** Equality-keyed merge: existing rows whose `keys` appear in the batch
    * are replaced (last-write-wins per key). */
  def mergeOnKeys(spark: SparkSession, batch: DataFrame, out: String,
    keys: Seq[String]): Unit =
    merge(spark, batch, out) { (existing, b) =>
      existing.join(b.select(keys.map(col): _*), keys, "left_anti")
    }

  /** Complete a [[merge]] swap interrupted mid-flight: a staged `.cq_tmp`
    * with a `_SUCCESS` marker but no live dir promotes; a leftover
    * `.cq_old` alongside a live dir (crash before cleanup) deletes;
    * anything else stale is discarded. */
  def healSwap(spark: SparkSession, out: String): Unit = {
    val hfs = fs(spark, out)
    val outP = new Path(out)
    val tmp = new Path(out + ".cq_tmp")
    val old = new Path(out + ".cq_old")
    if (!hfs.exists(outP)) {
      if (hfs.exists(tmp) && hfs.exists(new Path(tmp, "_SUCCESS")))
        require(hfs.rename(tmp, outP), s"heal failed: $tmp -> $outP")
      else if (hfs.exists(old))
        require(hfs.rename(old, outP), s"heal failed: $old -> $outP")
    }
    if (hfs.exists(tmp)) hfs.delete(tmp, true)
    if (hfs.exists(old)) hfs.delete(old, true)
  }
}
