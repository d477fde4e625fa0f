package graft

import org.apache.spark.sql.functions._

/** Laws for the statistical analytics ops ([[graft.ops.Analytics]]) and the
  * new vector/pipeline round: constructed-series ground truths (an injected
  * outlier, a known level shift, an alternating signal), the histogram's
  * no-silent-drops partition law, and the MIPS norm-augmentation ordering
  * equivalence that justifies serving MIPS through the cosine tiers.
  */
class AnalyticsSpec extends SparkTestBase {

  /** Write a minimal events.parquet fixture (ts = epoch + n minutes) so a
    * constructed series can be fed through the real operator path. */
  private def eventsDir(rows: Seq[(Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("analytics_fx").toString
    rows.toDF("event_id", "mins", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("mins") * 60))
      .withColumn("user_id", lit(1L))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_anomaly_mad: injected outlier is the ONLY flagged point") {
    // values 9/10/11 (median 10, MAD 1) plus one 50: dev=40 > 4·MAD=4
    val vals = Seq(10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 50.0)
    val dir = eventsDir(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, i.toLong, "a", v) })
    val out = ops.Analytics.tsAnomalyMad(spark, dir).collect()
    assert(out.length === 1, s"expected 1 anomaly, got ${out.length}")
    val r = out.head
    assert(r.getAs[Double]("value") === 50.0)
    assert(r.getAs[Double]("med") === 10.0)
    assert(r.getAs[Double]("mad") === 1.0)
  }

  test("ts_downsample_lttb: the spike survives, endpoints pinned, B points") {
    // 50 near-flat points with one huge spike: the visually-dominant
    // point MUST be among the 12 selected — the property LTTB exists for
    // (min/max/mean downsampling all erase or smear it)
    val vals = (0 until 50).map(i => if (i == 23) 500.0 else 10.0 + (i % 2))
    val dir = eventsDir(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, i.toLong, "a", v) })
    val out = ops.Analytics.tsDownsampleLttb(spark, dir).collect()
    assert(out.length === 12, s"expected 12 points, got ${out.length}")
    assert(out.count(_.getAs[Double]("value") == 500.0) === 1,
      "the spike was not selected")
    val ks = out.map(_.getAs[Long]("k")).sorted
    assert(ks.head === 0L && ks.last === 11L && ks.distinct.length === 12)
  }

  test("ts_anomaly_mad: MAD is robust — a clean shifted series flags nothing") {
    // same shape, no outlier; and a second series at 1000× scale proves
    // the threshold is scale-relative, not absolute
    val a = Seq(10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 11.0)
    val b = a.map(_ * 1000)
    val dir = eventsDir(
      a.zipWithIndex.map { case (v, i) => (i.toLong + 1, i.toLong, "a", v) } ++
      b.zipWithIndex.map { case (v, i) => (i.toLong + 100, i.toLong, "b", v) })
    assert(ops.Analytics.tsAnomalyMad(spark, dir).count() === 0)
  }

  test("ts_cusum: locates a constructed level shift exactly") {
    // 10 points at 0 then 10 at 10: mu=5, S_t bottoms at -50 on the last
    // pre-shift point (event_id 10)
    val vals = Seq.fill(10)(0.0) ++ Seq.fill(10)(10.0)
    val dir = eventsDir(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, i.toLong, "a", v) })
    val r = ops.Analytics.tsCusum(spark, dir).collect().head
    assert(r.getAs[Long]("cp_event_id") === 10L)
    assert(math.abs(r.getAs[Double]("s_at_cp") + 50.0) < 1e-9)
  }

  test("ts_autocorr: alternating series has r1=-19/20, r2=+18/20, r3=-17/20") {
    val vals = (0 until 20).map(i => if (i % 2 == 0) 1.0 else -1.0)
    val dir = eventsDir(vals.zipWithIndex.map { case (v, i) =>
      (i.toLong + 1, i.toLong, "a", v) })
    val r = ops.Analytics.tsAutocorr(spark, dir).collect().head
    assert(math.abs(r.getAs[Double]("r1") - (-19.0 / 20)) < 1e-9)
    assert(math.abs(r.getAs[Double]("r2") - (18.0 / 20)) < 1e-9)
    assert(math.abs(r.getAs[Double]("r3") - (-17.0 / 20)) < 1e-9)
  }

  test("ts_autocorr: fixture r_k bounded by Cauchy-Schwarz (|r| <= 1 + eps)") {
    val rows = ops.Analytics.tsAutocorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("r1", "r2", "r3").foreach { c =>
        assert(math.abs(r.getAs[Double](c)) <= 1.0 + 1e-6,
          s"$c out of bounds for ${r.getAs[String]("event_type")}") }
    }
  }

  test("agg_histogram: clamped bins PARTITION the input - sum(n) = |events|") {
    val hist = ops.Analytics.aggHistogram(spark, sf)
    val total = hist.agg(sum(col("n"))).head.getLong(0)
    val rows = Tables.load(spark, sf, "events").count()
    assert(total === rows, s"histogram dropped rows: $total vs $rows")
    // and bins stay inside the clamp range
    val bins = hist.select("bin").collect().map(_.getInt(0))
    assert(bins.forall(b => b >= 0 && b <= 19))
  }

  test("agg_corr: correlation within [-1, 1] on the fixture") {
    val rows = ops.Analytics.aggCorr(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("corr")) <= 1.0 + 1e-9) }
  }

  test("ts_ohlc: open/close equal the first/last point of each bucket") {
    val got = ops.Analytics.tsOhlc(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("bucket")) ->
        (r.getAs[Double]("open"), r.getAs[Double]("close"))).toMap
    val raw = Tables.load(spark, sf, "events")
      .select(col("event_type"), date_trunc("HOUR", col("ts")).as("bucket"),
        col("ts"), col("event_id"), col("value")).collect()
      .map(r => (r.getAs[String](0), r.getAs[java.sql.Timestamp](1),
        r.getAs[java.sql.Timestamp](2), r.getAs[Long](3), r.getAs[Double](4)))
      .groupBy(t => (t._1, t._2))
    raw.foreach { case (k, pts) =>
      val sorted = pts.sortBy(t => (t._3.getTime, t._4))
      val (o, c) = got(k)
      assert(o === sorted.head._5, s"open mismatch at $k")
      assert(c === sorted.last._5, s"close mismatch at $k")
    }
    assert(got.size === raw.size)
  }

  test("ts_resample_linear: exact midpoints and coincident grid points") {
    // points at :00 (0.0) and :20 (60.0): the :10 grid instant is the
    // exact midpoint 30.0; :00 and :20 coincide with real points
    val dir = eventsDir(Seq(
      (1L, 0L, "a", 0.0), (2L, 20L, "a", 60.0)))
    val got = ops.Analytics.tsResampleLinear(spark, dir).collect()
      .map(r => r.getAs[java.sql.Timestamp]("ts").toString ->
        r.getAs[Double]("interp")).toMap
    assert(got("1970-01-01 00:00:00.0") === 0.0)
    assert(got("1970-01-01 00:10:00.0") === 30.0)
    assert(got("1970-01-01 00:20:00.0") === 60.0)
    assert(got.size === 3)
  }

  test("ts_stl_decompose: a pure linear series decomposes exactly " +
    "(trend = y, seasonal = 0, resid = 0)") {
    // one point per hour, value = t: the centered 25-point MA of a linear
    // series IS the center value, exactly in decimal/double arithmetic
    val dir = eventsDir((0 until 72).map(t =>
      (t.toLong + 1, t.toLong * 60, "a", t.toDouble)))
    val rows = ops.Analytics.tsStlDecompose(spark, dir).collect()
    assert(rows.length === 72 - 24) // complete 25-windows only
    rows.foreach { r =>
      assert(r.getAs[Double]("trend") === r.getAs[Double]("y"))
      assert(r.getAs[Double]("seasonal") === 0.0)
      assert(r.getAs[Double]("resid") === 0.0)
    }
  }

  test("ts_stl_decompose: reconstruction identity and weighted centering " +
    "on the fixture") {
    val rows = ops.Analytics.tsStlDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val diff = r.getAs[Double]("y") - (r.getAs[Double]("trend") +
        r.getAs[Double]("seasonal") + r.getAs[Double]("resid"))
      assert(math.abs(diff) < 1e-9, s"reconstruction broke: $r")
    }
    // count-weighted centering: seasonal sums to ~0 over the decomposed rows
    val sums = rows.groupBy(_.getAs[String]("event_type"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("seasonal")).sum }
    sums.foreach(s => assert(math.abs(s) < 1e-6, s"centering broke: $s"))
  }

  test("sim_mips: norm-augmented cosine order equals inner-product order") {
    import graft.functions.GraftFunctions.vecDot
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(vecDot(spark, col("embedding"), col("embedding"))))
    val maxN = base.agg(max(col("nrm"))).head.getDouble(0)
    // augmented corpus vector: [x, sqrt(M^2 - |x|^2)]; query: [q, 0] —
    // augmented dot = <q,x>, augmented corpus norm = M for every row, so
    // cosine ranking under the augmentation IS inner-product ranking
    val aug = base.withColumn("aug_last",
      sqrt(lit(maxN * maxN) - col("nrm") * col("nrm")))
    val q = aug.filter(col("vec_id") % 100 === 0 && col("vec_id") < 2000)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
      .orderBy(col("aug_cos").desc, col("vec_id"))
    val augTop = aug.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      // augmented cosine: (<q,x> + 0*aug_last) / (q_aug_nrm * M); the
      // query-side norm is constant per q, so it can't change the order
      .withColumn("aug_cos",
        vecDot(spark, col("embedding"), col("q_emb")) / lit(maxN))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id"), col("rk")).collect()
      .map(r => (r.getLong(0), r.getInt(2).toLong) -> r.getLong(1)).toMap
    val mips = ops.Vectors.simMips(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rk").toLong) ->
        r.getAs[Long]("neighbor_id")).toMap
    assert(mips.nonEmpty)
    assert(mips === augTop, "augmented-cosine ranking diverged from MIPS")
  }

  test("sim_range_search / sim_mips: queries broadcast, corpus never shuffles") {
    Seq(ops.Vectors.simRangeSearch(spark, sf),
      ops.Vectors.simMips(spark, sf)).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastNestedLoopJoin"),
        "expected a broadcast join for the pinned query set")
      assert(!plan.contains("CartesianProduct"),
        "unbroadcast cartesian product in the query fan-out")
    }
  }

  test("ts_anomaly_mad: both ranking passes share one series-key exchange") {
    val plan = ops.Analytics.tsAnomalyMad(spark, sf)
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning\\(event_type".r
      .findAllMatchIn(plan).size
    assert(exchanges <= 1,
      s"median and MAD passes re-shuffled the series key ($exchanges exchanges)")
  }

  /** Events fixture with EXPLICIT user ids (eventsDir pins user_id=1) for
    * the funnel/cohort/burn ops, whose semantics live on the user axis. */
  private def userEventsDir(
      rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("user_fx").toString
    rows.toDF("event_id", "mins", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("mins") * 60))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts_funnel: stage chaining, the 7-day cut, and wrong-order events") {
    val day = 24L * 60
    val rows = Seq(
      // user 1: full ordered funnel inside the window
      (1L, 0L, 1L, "view", 1.0), (2L, 60L, 1L, "click", 1.0),
      (3L, 120L, 1L, "purchase", 1.0),
      // user 2: click BEFORE its first view — order matters, stage 1
      (4L, 0L, 2L, "click", 1.0), (5L, 60L, 2L, "view", 1.0),
      // user 3: click 8 days after the view — outside the 7-day window
      (6L, 0L, 3L, "view", 1.0), (7L, 8 * day, 3L, "click", 1.0),
      // user 4: never views — not in the funnel at all
      (8L, 0L, 4L, "purchase", 1.0),
      // user 5: purchase but no click — stage 3 requires stage 2
      (9L, 0L, 5L, "view", 1.0), (10L, 60L, 5L, "purchase", 1.0))
    val out = ops.Analytics.tsFunnel(spark, userEventsDir(rows)).collect()
    val stages = out.map(r =>
      r.getAs[Long]("user_id") -> r.getAs[Int]("reached_stage")).toMap
    assert(stages === Map(1L -> 3, 2L -> 1, 3L -> 1, 5L -> 1))
    val u1 = out.find(_.getAs[Long]("user_id") == 1L).get
    val (t1, t2, t3) = (u1.getAs[java.sql.Timestamp]("t1"),
      u1.getAs[java.sql.Timestamp]("t2"), u1.getAs[java.sql.Timestamp]("t3"))
    assert(t1.before(t2) && t2.before(t3), s"stage times not ordered: $u1")
  }

  test("ts_cohort_retention: exact constructed cells; every user lands in " +
    "its cohort's offset-0 cell") {
    val day = 24L * 60
    // user 1 active days 0, 1, 5 (day 0 twice — distinct grain collapses
    // it); user 2 active days 1, 3 (cohort day 1, offsets 0 and 2)
    val rows = Seq(
      (1L, 0L, 1L, "view", 1.0), (2L, 10L, 1L, "view", 1.0),
      (3L, day, 1L, "click", 1.0), (4L, 5 * day, 1L, "view", 1.0),
      (5L, day, 2L, "view", 1.0), (6L, 3 * day + 5, 2L, "error", 1.0))
    val df = ops.Analytics.tsCohortRetention(spark, userEventsDir(rows))
    assert(df.count() === 5, df.collect().mkString("; "))
    // offset-0 cells hold exactly the cohort populations: 2 users total
    assert(df.filter(col("day_offset") === 0)
      .agg(sum(col("active_users"))).head.getLong(0) === 2)
    // user 1's day-5 return and user 2's day-2 return are single-user cells
    assert(df.filter(col("day_offset") === 5)
      .head.getAs[Long]("active_users") === 1)
    assert(df.filter(col("day_offset") === 2)
      .head.getAs[Long]("active_users") === 1)
    assert(df.agg(min(col("day_offset"))).head.getLong(0) === 0)
  }

  test("ts_slo_burn: exact trailing sums and the two-window alert rule") {
    // hour 0: 10 events / 1 error (burn_1h = 0.5 — quiet); hour 1: 10
    // events / 5 errors (burn_1h = 2.5 AND 6h pool 6/20 → burn 1.5 → alert)
    val rows = (0 until 10).map { i =>
      (i.toLong + 1, i.toLong, 1L, if (i == 0) "error" else "view", 1.0) } ++
      (0 until 10).map { i =>
        (i.toLong + 11, 60L + i, 1L, if (i < 5) "error" else "view", 1.0) }
    val out = ops.Analytics.tsSloBurn(spark, userEventsDir(rows))
      .orderBy(col("bucket")).collect()
    assert(out.length === 2)
    val (h0, h1) = (out(0), out(1))
    assert(h0.getAs[Long]("errors") === 1 && h0.getAs[Long]("err_6h") === 1)
    assert(h0.getAs[Int]("alert") === 0)
    assert(h1.getAs[Long]("errors") === 5 && h1.getAs[Long]("err_6h") === 6 &&
      h1.getAs[Long]("tot_6h") === 20)
    assert(h1.getAs[Double]("burn_1h") === 2.5)
    assert(h1.getAs[Double]("burn_6h") === 6.0 / 20 / 0.2)
    assert(h1.getAs[Int]("alert") === 1)
  }
}
