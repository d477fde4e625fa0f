package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** Golden test replicating get_hot_intake_interval.py:121-147 exactly
    * (pulse = value >= 100 in the fixture analog):
    *  - zeros before the first pulse and the first pulse itself are dropped;
    *  - startTime is the FIRST ZERO after a pulse (:143-145), so
    *    rate = 60/(t_pulse − t_firstZeroOfRun + 1);
    *  - the zero-run gets the emitting pulse's rate (write_data :68-71);
    *  - consecutive pulses reuse the stale run start (reference quirk);
    *  - a trailing zero-run is never flushed. */
  test("pulse-interval golden series") {
    val rows = Seq(
      // (event_id, ts, user, value)   P = pulse
      (1L, ts("2024-01-01 00:00:00"), 1L, 5.0),   // zero before first pulse → dropped
      (2L, ts("2024-01-01 00:00:10"), 1L, 200.0), // P1: never emitted
      (3L, ts("2024-01-01 00:00:20"), 1L, 5.0),   // run start (first zero after P1)
      (4L, ts("2024-01-01 00:00:30"), 1L, 5.0),   // zero-run
      (5L, ts("2024-01-01 00:00:39"), 1L, 300.0), // P2: 60/(19+1) = 3.0
      (6L, ts("2024-01-01 00:00:49"), 1L, 150.0), // P3: stale run start → 60/(29+1) = 2.0
      (7L, ts("2024-01-01 00:01:00"), 1L, 5.0))   // zero after last pulse → dropped
      .toDF("event_id", "ts", "user_id", "value")
    val dir = java.nio.file.Files.createTempDirectory("pulse").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.TimeSeries.winLagInterval(spark, dir)
      .select("event_id", "rate").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(3L, 4L, 5L, 6L))
    assert(out(3L) == 3.0 && out(4L) == 3.0 && out(5L) == 3.0)
    assert(out(6L) == 2.0)
  }

  test("pattern match: a planted scaled+shifted surge is the rank-1 hit " +
    "with distance exactly 0 — z-normalization erases scale and offset") {
    // the op's query shape, affine-transformed (×7.5 + 42): z-normalized
    // distance must be EXACTLY 0 at the planted offset
    val shape = Seq(0.0, 1.0, 3.0, 6.0, 3.0, 1.0, 0.0, 0.0)
    val planted = shape.map(_ * 7.5 + 42.0)
    // a decoy series whose values wander but never trace the shape
    val noise = Seq(10.0, 35.0, 12.0, 40.0, 11.0, 38.0, 13.0, 41.0,
      12.0, 36.0, 14.0, 39.0)
    val pre = Seq(55.0, 48.0, 61.0, 52.0)
    def series(name: String, vals: Seq[Double], base: Int) =
      vals.zipWithIndex.map { case (v, i) =>
        ((base + i).toLong, ts(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"),
          1L, name, v, "{}")
      }
    val rows = (series("surge", pre ++ planted ++ pre.reverse, 100) ++
      series("decoy", noise, 500))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("patmatch").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.TimeSeries.tsPatternMatch(spark, dir)
      .select("event_type", "win_start", "rk", "dist2")
      .as[(String, Timestamp, Int, Double)].collect()
    val top = out.filter(r => r._1 == "surge" && r._3 == 1).head
    // planted window starts after the 4 preamble points → second 4
    assert(top._2 == ts("2024-01-01 00:00:04"), s"top hit at ${top._2}")
    assert(top._4 == 0.0, s"planted-surge distance ${top._4}")
    // every other window is strictly worse, and the decoy's best is far off
    assert(out.filter(r => r._1 == "surge" && r._3 > 1).forall(_._4 > 0.0))
    val decoyBest = out.filter(r => r._1 == "decoy" && r._3 == 1).head._4
    assert(decoyBest > 1.0, s"decoy should not resemble the surge: $decoyBest")
    OpCaches.releaseAll()
  }

  test("backfill: filled is last non-missing reading, never null after one") {
    val df = ops.TimeSeries.winBackfill(spark, sf)
    val w = df.filter(col("reading").isNotNull && col("filled") =!= col("reading"))
    assert(w.count() == 0, "a present reading must fill with itself")
  }

  test("time buckets partition all events") {
    val total = Tables.load(spark, sf, "events").count()
    val bucketed = ops.TimeSeries.winTimeBucket(spark, sf)
      .agg(sum("n")).as[Long].head()
    assert(bucketed == total)
  }

  test("session windows: no session smaller than 1 event, sums match total") {
    val s = ops.TimeSeries.tsSessionWindow(spark, sf)
    assert(s.filter(col("n_events") < 1).count() == 0)
    val total = Tables.load(spark, sf, "events").count()
    assert(s.agg(sum("n_events")).as[Long].head() == total)
  }

  test("upsert law: ingesting twice equals once") {
    val once = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"),
        max(col("event_id")).as("version"))
    val twice = ops.TimeSeries.tsUpsertDedup(spark, sf)
    assert(twice.exceptAll(once).count() == 0 && once.exceptAll(twice).count() == 0)
  }

  test("retention keeps a newest-day prefix") {
    val rows = ops.TimeSeries.tsRetention(spark, sf)
      .orderBy(col("day").desc).select("keep").as[Boolean].collect()
    val dropIdx = rows.indexOf(false)
    if (dropIdx >= 0) assert(rows.drop(dropIdx).forall(!_),
      "keep must be a prefix under newest-first order")
  }
}
