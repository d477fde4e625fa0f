package graft

import org.apache.spark.sql.functions._

class JoinsAggSpec extends SparkTestBase {

  test("broadcast join plans BroadcastHashJoin, no shuffle of dims") {
    val plan = ops.Joins.joinBroadcast(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("sortmerge hint plans SortMergeJoin") {
    val plan = ops.Joins.joinSortmerge(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(1500))
  }

  test("semi + anti partition the customer set") {
    val c = Tables.load(spark, sf, "customer").count()
    val o = Tables.load(spark, sf, "orders")
    val semiAll = Tables.load(spark, sf, "customer")
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    val anti = ops.Joins.joinLeftAnti(spark, sf).count()
    assert(semiAll + anti == c)
  }

  test("asof: matched view ts is <= click ts") {
    val bad = ops.Joins.joinAsof(spark, sf)
      .filter(col("last_view_ts") > col("ts")).count()
    assert(bad == 0)
  }

  test("approx distinct within 10% of exact") {
    val approx = ops.Aggregates.aggApproxDistinctRaw(spark, sf)
      .select("l_returnflag", "approx_parts")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k).toDouble / n - 1.0) < 0.10,
        s"$k: approx=${approx(k)} exact=$n")
    }
  }

  test("approx percentile within sketch accuracy of exact") {
    val approx = ops.Aggregates.aggApproxPercentileRaw(spark, sf)
      .select("l_returnflag", "ap50", "ap90_price")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = ops.Aggregates.aggPercentile(spark, sf)
      .select("l_returnflag", "p50", "p90_price")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // accuracy=1000 bounds rank error at n/1000; translate to a loose value
    // tolerance (5% relative) for the fixture's smooth distributions
    exact.foreach { case (k, (p50, p90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 / p50 - 1.0) < 0.05, s"$k p50: $a50 vs $p50")
      assert(math.abs(a90 / p90 - 1.0) < 0.05, s"$k p90_price: $a90 vs $p90")
    }
  }

  test("rollup row count = groups + subtotals + grand total") {
    val o = Tables.load(spark, sf, "orders")
    val g2 = o.select("o_orderstatus", "o_orderpriority").distinct.count()
    val g1 = o.select("o_orderstatus").distinct.count()
    assert(ops.Aggregates.aggRollup(spark, sf).count() == g2 + g1 + 1)
  }

  test("heavy hitters: sketch-then-verify equals the exact heavy-hitter " +
    "set under vocab >> k, sketch stays bounded, recall guarantee holds") {
    import spark.implicits._
    // constructed corpus: 3 planted heavy tokens drowned in a 500-word
    // rare vocabulary — |vocab| = 503 >> k = 32, so the sketch must evict
    // constantly and still never lose a true heavy hitter
    val heavy = Seq.fill(400)("alpha") ++ Seq.fill(300)("beta") ++
      Seq.fill(200)("gamma")
    val rare = (0 until 2000).map(i => s"rare${i % 500}")
    val words = new scala.util.Random(7).shuffle(heavy ++ rare)
    val docs = words.grouped(25).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" "), "en", "gen", 1L) }
      .toSeq.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("hh").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val out = ops.Aggregates.aggHeavyHitters(spark, dir)
      .select("token", "cnt").as[(String, Long)].collect().toMap
    val n = words.size
    val k = ops.Aggregates.HhK
    // exact heavy hitters computed driver-side: count * k > N
    val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }.toMap
    assert(out == exact, s"got $out, want $exact")
    assert(out.keySet == Set("alpha", "beta", "gamma"))
    // the raw sketch respects its capacity AND the recall guarantee even
    // under adversarial merge order (many small partial sketches)
    val mg = new functions.GraftFunctions.MisraGries(k)
    val partials = words.grouped(40)
      .map(_.foldLeft(mg.zero)(mg.reduce)).toSeq
    partials.foreach(p => assert(p._1.length <= k))
    val merged = partials.reduce(mg.merge)
    assert(merged._1.length <= k)
    val mergedKeys = merged._1.toSet
    for ((t, _) <- exact)
      assert(mergedKeys.contains(t), s"guarantee violated: $t evicted")
    OpCaches.releaseAll()
  }

  test("join_salted_skew: salted result equals the plain unsalted join; " +
    "the shuffled path is pinned (no broadcast)") {
    import org.apache.spark.sql.functions._
    val salted = ops.Joins.joinSaltedSkew(spark, sf)
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"),
      s"salting demo degraded off the shuffled path: ${plan.take(1500)}")
    assert(!plan.contains("BroadcastHashJoin"),
      "broadcast would defeat the salting demo")
    val plain = graft.Tables.load(spark, sf, "events")
      .join(graft.Tables.load(spark, sf, "customer"),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        graft.Tables.dsum(col("value")).as("sum_value"))
    val a = salted.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).sortBy(_._1)
    val b = plain.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))).sortBy(_._1)
    assert(a.sameElements(b), s"salted ${a.mkString(",")} != plain ${b.mkString(",")}")
  }
}
