package graft

import org.apache.spark.sql.functions._

/** Specs for the round-10 fourth wave: interval-overlap join, bitmap
  * exact-distinct, seasonal-naive forecast eval, the hashing-trick
  * featurizer, and the dedup recall/precision report. */
class Wave4Spec extends SparkTestBase {
  import spark.implicits._

  test("interval overlap: bucketized equi-join equals the direct theta join") {
    val g = 600L * 1000000L
    val ev = Tables.load(spark, sf, "events")
    val inc = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("s1"))
      .withColumn("e1", col("s1") + g)
    val att = ev.filter(col("event_type") === "purchase")
      .select(unix_micros(col("ts")).as("e2"))
      .withColumn("s2", col("e2") - g)
    // direct theta join (the oracle shape), aggregated identically
    val direct = inc.join(att,
        col("s1") < col("e2") && col("s2") < col("e1"))
      .select(date_trunc("HOUR",
        timestamp_micros(greatest(col("s1"), col("s2")))).as("hour"),
        (least(col("e1"), col("e2")) -
          greatest(col("s1"), col("s2"))).as("ov"))
      .groupBy(col("hour"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("ov")).as("overlap_us"))
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    val bucketized = ops.Joins.joinIntervalOverlap(spark, sf)
      .as[(java.sql.Timestamp, Long, Long)].collect().toSet
    assert(bucketized == direct)
    assert(bucketized.nonEmpty, "fixture produced no overlapping pairs")
  }

  test("bitmap distinct: equals COUNT(DISTINCT) and is partition-invariant") {
    val got = ops.Aggregates.aggBitmapDistinct(spark, sf)
      .select("day", "n_users").as[(java.sql.Timestamp, Long)]
      .collect().toMap
    val want = Tables.load(spark, sf, "events")
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(got == want)
    // the OR-merge is idempotent/commutative: any partitioning agrees —
    // exercise single-partition (no merge) vs many-partition (merge-heavy)
    val bitmap = udaf(new functions.GraftFunctions.BitmapDistinct,
      org.apache.spark.sql.Encoders.scalaLong)
    val ids = Seq(-5000L, -5000L, -1L, 0L, 63L, 64L, 4095L, 4096L,
      1L << 40, (1L << 40) + 1, Long.MinValue, Long.MaxValue)
    for (parts <- Seq(1, 7)) {
      val n = ids.toDF("id").repartition(parts)
        .agg(bitmap(col("id"))).as[Long].head()
      assert(n == ids.distinct.size, s"parts=$parts")
    }
  }

  test("forecast eval: a perfectly daily-periodic series has mae = smape = 0") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fc").toString
    // 3 days of hourly points, value = f(hour-of-day) only — seasonal-naive
    // with period 24 h predicts it exactly from day 2 onward
    val rows = for (d <- 0 until 3; h <- 0 until 24) yield {
      val ts = java.sql.Timestamp.valueOf(f"2024-03-0${d + 1}%d $h%02d:30:00")
      (d * 24L + h, ts, 1L, "pulse", 10.0 + (h % 7) * 1.5, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = ops.Analytics.tsForecastEval(spark, dir)
      .as[(String, Long, Double, Double)].collect()
    assert(out.length == 1)
    val (_, n, mae, smape) = out.head
    assert(n == 48, s"expected 48 evaluable hours, got $n") // days 2..3
    assert(mae == 0.0 && smape == 0.0, s"mae=$mae smape=$smape")
  }

  test("hashing trick: per-doc mass equals token count, dims within range") {
    val feats = ops.Text.textHashingTrick(spark, sf)
    val dims = feats.agg(min(col("dim")), max(col("dim")))
      .as[(Int, Int)].head()
    assert(dims._1 >= 0 && dims._2 < 64, s"dims out of range: $dims")
    val mass = feats.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("m")).as[(Long, Long)].collect().toMap
    val toks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(filter(
        split(lower(col("text")), "[^a-z0-9']+"), t => t =!= ""))
        .cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    // docs with zero tokens emit no feature rows; all others conserve mass
    for ((id, n) <- toks if n > 0) assert(mass.get(id).contains(n), s"doc $id")
  }

  test("dedup recall report: counts bounded, rates in [0,1], truth non-vacuous") {
    val rows = ops.Dedup.dedupRecallReport(spark, sf)
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("embcos_lsh", "ngram_capped", "semantic_kmeans"))
    for ((tier, truth, pairs, hits, recall, prec) <- rows) {
      assert(hits <= truth && hits <= pairs, tier)
      for (r <- recall) assert(r >= 0.0 && r <= 1.0, tier)
      for (p <- prec) assert(p >= 0.0 && p <= 1.0, tier)
    }
    // the shipped fixture has planted textual near-dups — the ngram truth
    // set must be non-empty or the audit is vacuous
    val ngram = rows.find(_._1 == "ngram_capped").get
    assert(ngram._2 > 0, "uncapped jaccard truth empty — fixture drifted")
  }
}
