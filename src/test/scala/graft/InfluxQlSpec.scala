package graft

import graft.influxql.InfluxQL
import org.apache.spark.sql.functions._

/** Specs for the InfluxQL front end: parser shape, rejection of
  * unsupported syntax, and translation semantics against hand-built
  * DataFrame equivalents (the DuckDB oracle covers the full pipeline). */
class InfluxQlSpec extends SparkTestBase {
  import spark.implicits._

  test("parser extracts fields, conditions, buckets, tags, fill, limit") {
    val q = InfluxQL.parse(
      "SELECT mean(value) AS m, count(value) FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND user_id = 3 " +
        "GROUP BY time(6h), event_type fill(previous) " +
        "ORDER BY time DESC LIMIT 10")
    assert(q.fields == Seq(
      InfluxQL.Agg("mean", "value", Some("m")),
      InfluxQL.Agg("count", "value", None)))
    assert(q.measurement == "events")
    assert(q.conds == Seq(
      InfluxQL.Cond("time", ">=", Left("2024-01-01 00:00:00")),
      InfluxQL.Cond("user_id", "=", Right(3.0))))
    assert(q.timeBucket.contains((6, "h")))
    assert(q.groupTags == Seq("event_type"))
    assert(q.fill.contains("previous"))
    assert(q.orderDesc && q.limit.contains(10))
  }

  test("parser round-trip law: parse(print(q)) == q over random ASTs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ident = Gen.chooseNum(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val field = Gen.oneOf(
      Gen.zip(ident, Gen.option(ident)).map { case (n, a) => InfluxQL.Raw(n, a) },
      for {
        fn <- Gen.oneOf("mean", "sum", "count", "min", "max")
        n <- ident; a <- Gen.option(ident)
      } yield InfluxQL.Agg(fn, n, a))
    val cond = for {
      c <- Gen.oneOf(ident, Gen.const("time"))
      op <- Gen.oneOf("=", "!=", "<", "<=", ">", ">=")
      v <- Gen.oneOf(
        Gen.listOfN(10, Gen.alphaNumChar).map(x => Left(x.mkString)),
        Gen.chooseNum(-1000.0, 1000.0).map(Right(_)))
    } yield InfluxQL.Cond(c, op, v)
    val query = for {
      fields <- Gen.nonEmptyListOf(field).map(_.take(3))
      meas <- ident
      conds <- Gen.listOf(cond).map(_.take(3))
      bucket <- Gen.option(Gen.zip(Gen.chooseNum(1, 48),
        Gen.oneOf("s", "m", "h", "d")))
      tags <- Gen.listOf(ident).map(_.take(2).distinct)
      fill <- Gen.option(Gen.oneOf("previous", "0", "none"))
      desc <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.chooseNum(1, 9999))
      into <- Gen.option(ident)
    } yield InfluxQL.Query(fields, meas, conds, bucket, tags, fill, desc,
      limit, into)
    val qs = (0 until 200).flatMap(i =>
      query.apply(Gen.Parameters.default, Seed(1234L + i)))
    assert(qs.size > 150, "generator drought")
    qs.foreach { q =>
      val printed = InfluxQL.print(q)
      assert(InfluxQL.parse(printed) == q, s"round-trip broke for: $printed")
    }
  }

  test("parser rejects unsupported statements") {
    intercept[IllegalArgumentException](InfluxQL.parse("DROP MEASUREMENT flow"))
    intercept[IllegalArgumentException](
      InfluxQL.parse("SELECT percentile(value, 95) FROM events"))
  }

  test("raw select translates to the equivalent filter+project") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val got = InfluxQL.run(spark, m,
      "SELECT value FROM events WHERE event_type = 'click' AND value > 50")
      .as[(java.sql.Timestamp, Double)].collect().toSet
    val want = m.filter(col("event_type") === "click" && col("value") > 50)
      .select(col("time"), col("value"))
      .as[(java.sql.Timestamp, Double)].collect().toSet
    assert(got == want)
  }

  test("store.influxql: query a stored measurement, day partitions pruned") {
    val root = java.nio.file.Files.createTempDirectory("ms_iql").toString
    val store = new graft.store.MeasurementStore(spark, root)
    store.append("flow", Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value")))
    val got = store.influxql("flow",
      "SELECT mean(value) AS mv, count(value) AS n FROM flow " +
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-04 00:00:00' " +
        "GROUP BY time(1d)")
    val want = Tables.load(spark, sf, "events")
      .filter(col("ts") >= to_timestamp(lit("2024-01-02 00:00:00"))
        && col("ts") < to_timestamp(lit("2024-01-04 00:00:00")))
      .groupBy(date_trunc("DAY", col("ts")).as("time"))
      .agg(Tables.davg(col("value")).as("mv"), count(col("value")).as("n"))
    assert(got.select("time", "mv", "n").collect().toSet ==
      want.select("time", "mv", "n").collect().toSet)
    // the time-range conjuncts must prune the day partitions at the scan
    val scan = store.influxql("flow",
      "SELECT value FROM flow WHERE time >= '2024-01-02 00:00:00' " +
        "AND time < '2024-01-04 00:00:00'")
      .queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("day"),
      scan.take(1200))
  }

  test("SELECT INTO writes the derived series back to the store") {
    val root = java.nio.file.Files.createTempDirectory("ms_into").toString
    val store = new graft.store.MeasurementStore(spark, root)
    store.append("flow", Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value")))
    val result = store.influxql("flow",
      "SELECT mean(value) AS mv INTO hourly_rates FROM flow " +
        "GROUP BY time(1d), user_id")
    val written = store.read("hourly_rates")
    assert(written.count() == result.count())
    val a = result.select("time", "user_id", "mv")
      .as[(java.sql.Timestamp, Long, Double)].collect().toSet
    val b = written.select("time", "user_id", "mv")
      .as[(java.sql.Timestamp, Long, Double)].collect().toSet
    assert(a == b, "written series must equal the query result")
  }

  test("compact rewrites day partitions to one file, preserving content") {
    val root = java.nio.file.Files.createTempDirectory("ms_compact").toString
    val store = new graft.store.MeasurementStore(spark, root)
    val points = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("m", points) // two appends => >=2 files per day
    store.append("m", points)
    val before = store.read("m")
      .select("event_type", "user_id", "time", "value")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val report = store.compact("m")
    assert(report.nonEmpty)
    report.foreach { case (day, nBefore, nAfter) =>
      assert(nBefore >= 2, s"$day had $nBefore files before compaction")
      assert(nAfter == 1, s"$day has $nAfter files after compaction")
    }
    val after = store.read("m")
      .select("event_type", "user_id", "time", "value")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(before == after, "compaction must preserve the exact multiset")
  }

  test("fill(previous) densifies every bucket and carries values forward") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val filled = InfluxQL.run(spark, m,
      "SELECT mean(value) AS mv FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-03 00:00:00' " +
        "GROUP BY time(12h), user_id fill(previous)")
    val users = m.filter(col("time") >= to_timestamp(lit("2024-01-01 00:00:00"))
        && col("time") < to_timestamp(lit("2024-01-03 00:00:00")))
      .select("user_id").distinct().count()
    assert(filled.count() == users * 4, "4 buckets per user in range")
    // once a user has a value, later buckets must never be null again
    val regressions = filled
      .withColumn("seen", count(col("mv")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("time"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .filter(col("seen") > 0 && col("mv").isNull)
      .count()
    assert(regressions == 0, "LOCF must carry values forward")
  }
}
