package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkTestBase {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("Graft.session registers the custom functions for plain SQL") {
    val s = Graft.session() // getOrCreate reuses the test session
    Tables.load(s, sf, "embeddings").createOrReplaceTempView("emb_sql")
    val n = s.sql(
      "SELECT vec_dot(embedding, embedding) AS d, band_keys(embedding) AS bk " +
        "FROM emb_sql WHERE vec_dot(embedding, embedding) > 0")
      .count()
    assert(n > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("all queries run non-empty on sf0.001") {
    // set_except / join_left_anti can legitimately be empty at tiny SF;
    // everything else must produce rows for the demo to mean anything.
    val allowEmpty = Set("set_except", "join_left_anti", "ts_staleness",
      "ts_staleness_alert", "dedup_exact")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(allowEmpty(name) || n > 0, s"$name returned 0 rows")
    }
  }

  test("q1_agg values are sane") {
    val rows = ops.Relational.q1Agg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty / n - avgQty) < 1e-6)
    }
  }

  test("projection is pruned at the scan (ReadSchema)") {
    val plan = ops.Relational.projectPrune(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("l_orderkey"))
    assert(!plan.contains("l_shipdate"), "unused column reached the scan")
  }

  test("time-range filter is pushed to parquet (PushedFilters)") {
    val plan = ops.Relational.filterTagEq(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("IsNotNull(event_type)"), plan.take(2000))
  }

  test("events.ts normalizes to timestamp") {
    val df = Tables.load(spark, sf, "events")
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.filter(col("ts").isNull).count() == 0)
  }
}
