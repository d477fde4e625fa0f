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
    val agg = for {
      fn <- Gen.oneOf("mean", "sum", "count", "min", "max", "first", "last",
        "spread", "stddev", "median", "count_distinct", "distinct", "mode")
      n <- ident
    } yield InfluxQL.Agg(fn, n, None)
    val perc = for {
      n <- ident; p <- Gen.chooseNum(1, 99)
    } yield InfluxQL.Agg("percentile", n, None, Some(p.toDouble))
    val transform = for {
      // distinct/mode are standalone shapes: the parser now rejects them
      // inside transforms (as it always did inside math fns)
      inner <- Gen.oneOf(
        agg.suchThat(a => a.fn != "distinct" && a.fn != "mode"), perc)
      fnArg <- Gen.oneOf(
        Gen.zip(Gen.oneOf("derivative", "non_negative_derivative"),
          Gen.option(Gen.zip(Gen.chooseNum(1, 60), Gen.oneOf("s", "m", "h"))
            .map { case (n, u) => s"$n$u" })),
        Gen.zip(Gen.const("moving_average"),
          Gen.chooseNum(2, 12).map(n => Option(n.toString))),
        Gen.zip(Gen.oneOf("difference", "non_negative_difference",
          "cumulative_sum"), Gen.const(Option.empty[String])))
      a <- Gen.option(ident)
      // raw-series form: a bare field inner round-trips too
      raw <- Gen.oneOf(true, false)
      in2 <- if (raw) ident.map(InfluxQL.Raw(_, None): InfluxQL.Field)
      else Gen.const(inner: InfluxQL.Field)
    } yield InfluxQL.Transform(fnArg._1, in2, fnArg._2, a)
    val rawArg = Gen.option(Gen.zip(Gen.chooseNum(1, 60),
      Gen.oneOf("s", "m", "h")).map { case (n, u) => s"$n$u" })
    val elapsed = Gen.zip(ident, rawArg, Gen.option(ident))
      .map { case (n, g, a) => InfluxQL.Elapsed(n, g, a) }
    val integral = Gen.zip(ident, rawArg, Gen.option(ident))
      .map { case (n, g, a) => InfluxQL.Integral(n, g, a) }
    val arith = for {
      inner <- Gen.oneOf(
        ident.map(InfluxQL.Raw(_, None): InfluxQL.Field),
        agg.suchThat(a => a.fn != "distinct" && a.fn != "mode")
          .map(a => a: InfluxQL.Field))
      op <- Gen.oneOf("*", "/", "+", "-")
      k <- Gen.oneOf(Gen.chooseNum(1, 999).map(_.toDouble),
        Gen.chooseNum(1, 999).map(_ / 100.0))
      a <- Gen.option(ident)
    } yield InfluxQL.Arith(inner, op, k, a)
    val mathFn = for {
      fn <- Gen.oneOf("abs", "sqrt", "floor", "ceil", "round")
      inner <- Gen.oneOf(
        ident.map(InfluxQL.Raw(_, None): InfluxQL.Field),
        agg.suchThat(a => a.fn != "distinct" && a.fn != "mode")
          .map(a => a: InfluxQL.Field))
      a <- Gen.option(ident)
    } yield InfluxQL.MathFn(fn, inner, a)
    val binop = {
      // both sides the SAME kind (the parser rejects mixing); nested trees
      // exercise the precedence-aware print/parse round-trip
      val rawAtom: Gen[InfluxQL.Field] = ident.map(InfluxQL.Raw(_, None))
      val aggAtom: Gen[InfluxQL.Field] =
        agg.suchThat(a => a.fn != "distinct" && a.fn != "mode")
          .map(a => a: InfluxQL.Field)
      def node(depth: Int, atom: Gen[InfluxQL.Field]): Gen[InfluxQL.Field] =
        for {
          l <- if (depth > 0) Gen.frequency(3 -> atom, 2 -> node(depth - 1, atom))
          else atom
          op <- Gen.oneOf("*", "/", "+", "-")
          r <- if (depth > 0) Gen.frequency(3 -> atom, 2 -> node(depth - 1, atom))
          else atom
        } yield InfluxQL.BinOp(l, op, r, None): InfluxQL.Field
      for {
        isRaw <- Gen.oneOf(true, false)
        b <- node(2, if (isRaw) rawAtom else aggAtom)
        a <- Gen.option(ident)
      } yield (b: @unchecked) match {
        case bb: InfluxQL.BinOp => bb.copy(alias = a)
      }
    }
    val hwAgg = agg.suchThat(a => a.fn != "distinct" && a.fn != "mode")
    val holtWinters = for {
      inner <- hwAgg; h <- Gen.chooseNum(1, 12); m <- Gen.chooseNum(0, 6)
      fit <- Gen.oneOf(true, false); a <- Gen.option(ident)
    } yield InfluxQL.HoltWinters(inner, h, m, fit, a)
    val techAnalysis = for {
      fn <- Gen.oneOf("exponential_moving_average", "relative_strength_index",
        "chande_momentum_oscillator", "double_exponential_moving_average",
        "triple_exponential_moving_average", "triple_exponential_derivative",
        "kaufmans_efficiency_ratio", "kaufmans_adaptive_moving_average")
      inner <- hwAgg; n <- Gen.chooseNum(2, 20); a <- Gen.option(ident)
    } yield InfluxQL.TechAnalysis(fn, inner, n, a)
    val atan2F = for {
      isRaw <- Gen.oneOf(true, false)
      atom = if (isRaw) ident.map(InfluxQL.Raw(_, None): InfluxQL.Field)
        else hwAgg.map(a => a: InfluxQL.Field)
      y <- atom; x <- atom; a <- Gen.option(ident)
    } yield InfluxQL.Atan2(y, x, a)
    val field = Gen.oneOf(
      Gen.zip(ident, Gen.option(ident)).map { case (n, a) => InfluxQL.Raw(n, a) },
      Gen.zip(agg, Gen.option(ident)).map { case (g, a) => g.copy(alias = a) },
      Gen.zip(perc, Gen.option(ident)).map { case (g, a) => g.copy(alias = a) },
      transform, elapsed, integral, arith, mathFn, binop,
      holtWinters, techAnalysis, atan2F)
    val cond = for {
      c <- Gen.oneOf(ident, Gen.const("time"))
      op <- Gen.oneOf("=", "!=", "<", "<=", ">", ">=")
      v <- Gen.oneOf(
        Gen.listOfN(10, Gen.alphaNumChar).map(x => Left(x.mkString)),
        Gen.chooseNum(-1000.0, 1000.0).map(Right(_)))
      rel <- Gen.option(Gen.oneOf(Gen.const(""),
        Gen.zip(Gen.oneOf("-", "+"), Gen.chooseNum(1, 90),
          Gen.oneOf("s", "m", "h", "d")).map { case (s, n, u) => s"$s$n$u" }))
      reOp <- Gen.oneOf("=~", "!~")
      rePat <- Gen.listOfN(6, Gen.alphaNumChar).map(x => s"^${x.mkString}$$")
      kind <- Gen.chooseNum(0, 3)
    } yield (kind, rel) match {
      case (0, Some(off)) => InfluxQL.Cond(c, op, Right(0), Some(off))
      case (1, _) => InfluxQL.Cond(c, reOp, Left(rePat))
      case _ => InfluxQL.Cond(c, op, v)
    }
    val query = for {
      fields <- Gen.nonEmptyListOf(field).map(_.take(3))
      meas <- ident
      conds <- Gen.listOf(cond).map(_.take(3))
      orGroups <- Gen.listOf(Gen.listOfN(2, cond)).map(_.take(2))
      bucket <- Gen.option(Gen.zip(Gen.chooseNum(1, 48),
        Gen.oneOf("s", "m", "h", "d")))
      bucketOff <- Gen.option(Gen.zip(Gen.oneOf("", "-"),
        Gen.chooseNum(1, 23), Gen.oneOf("s", "m", "h"))
        .map { case (s, n, u) => s"$s$n$u" })
      tags <- Gen.listOf(ident).map(_.take(2).distinct)
      fill <- Gen.option(Gen.oneOf("previous", "0", "none", "null", "linear"))
      desc <- Gen.oneOf(true, false)
      limit <- Gen.option(Gen.chooseNum(1, 9999))
      into <- Gen.option(ident)
      offset <- Gen.option(Gen.chooseNum(1, 999))
      slimit <- Gen.option(Gen.chooseNum(1, 99))
      soffset <- Gen.option(Gen.chooseNum(1, 99))
      tz <- Gen.option(Gen.oneOf("America/Denver", "UTC", "Asia/Tokyo"))
      fromList <- Gen.oneOf(Gen.const(Seq.empty[String]),
        Gen.listOfN(2, ident), Gen.listOfN(3, ident))
    } yield InfluxQL.Query(fields,
      fromList.headOption.getOrElse(meas), conds, bucket, tags, fill, desc,
      limit, into, offset, slimit, soffset, orConds = orGroups, tz = tz,
      bucketOffset = if (bucket.isDefined) bucketOff else None,
      fromList = if (fromList.size > 1) fromList else Nil)
    val qs = (0 until 200).flatMap(i =>
      query.apply(Gen.Parameters.default, Seed(1234L + i)))
    assert(qs.size > 150, "generator drought")
    qs.foreach { q =>
      val printed = InfluxQL.print(q)
      assert(InfluxQL.parse(printed) == q, s"round-trip broke for: $printed")
    }
    val sel = InfluxQL.Query(
      Seq(InfluxQL.Selector("top", "value", 5, Some("v"))),
      "events", Nil, None, Seq("host"), None, orderDesc = false, None, None)
    assert(InfluxQL.parse(InfluxQL.print(sel)) == sel)
    val sel3 = InfluxQL.Query(
      Seq(InfluxQL.Selector("bottom", "value", 3, None, Some("host"))),
      "events", Nil, Some((1, "d")), Nil, None, orderDesc = false, None, None)
    assert(InfluxQL.parse(InfluxQL.print(sel3)) == sel3)
    // FROM /regex/ and fill(<number>) round-trip too
    val rx = InfluxQL.Query(
      Seq(InfluxQL.Agg("count", "value", Some("n"))), "__regex",
      Nil, Some((1, "d")), Nil, Some("100"), orderDesc = false, None, None,
      fromRegex = Some("^events"))
    assert(InfluxQL.parse(InfluxQL.print(rx)) == rx)
    // subqueries round-trip too (the parsed outer measurement is the
    // placeholder, so nest a generated inner under a canonical outer)
    qs.take(40).foreach { innerQ =>
      val inner = innerQ.copy(into = None)
      val outer = InfluxQL.Query(
        Seq(InfluxQL.Agg("max", "mv", Some("peak"))), "__sub",
        Nil, Some((1, "d")), Nil, None, orderDesc = false, None, None,
        sub = Some(inner))
      val printed = InfluxQL.print(outer)
      assert(InfluxQL.parse(printed) == outer,
        s"subquery round-trip broke for: $printed")
    }
    // print is TOTAL over programmatically built ASTs (round-8 advice):
    // an aliased inner in forecast/TA/atan2 — unconstructible via parse,
    // which rejects inner AS — renders bare and re-parses cleanly
    val aliasedInner = InfluxQL.Agg("mean", "v", Some("m"))
    val hwAliased = InfluxQL.Query(
      Seq(InfluxQL.HoltWinters(aliasedInner, 3, 0, withFit = false, None)),
      "events", Nil, Some((1, "h")), Nil, None, orderDesc = false, None, None)
    val hwPrinted = InfluxQL.print(hwAliased)
    assert(hwPrinted.contains("holt_winters(mean(v), 3, 0)"), hwPrinted)
    assert(InfluxQL.parse(hwPrinted) ==
      hwAliased.copy(fields = Seq(InfluxQL.HoltWinters(
        aliasedInner.copy(alias = None), 3, 0, withFit = false, None))))
    val taAliased = hwAliased.copy(fields = Seq(
      InfluxQL.TechAnalysis("relative_strength_index", aliasedInner, 4, None)))
    assert(InfluxQL.parse(InfluxQL.print(taAliased)) == taAliased.copy(
      fields = Seq(InfluxQL.TechAnalysis("relative_strength_index",
        aliasedInner.copy(alias = None), 4, None))))
    // aliased Arith operand inside atan2 also renders bare (formerly the
    // strip covered Raw/Agg only — inconsistently)
    val arithAliased = InfluxQL.Arith(
      InfluxQL.Agg("max", "v", None), "*", 2.0, Some("k"))
    val atanAliased = hwAliased.copy(fields = Seq(
      InfluxQL.Atan2(arithAliased, InfluxQL.Agg("min", "v", None), None)))
    val atanPrinted = InfluxQL.print(atanAliased)
    assert(atanPrinted.contains("atan2(max(v) * 2, min(v))"), atanPrinted)
    assert(InfluxQL.parse(atanPrinted) == atanAliased.copy(fields = Seq(
      InfluxQL.Atan2(arithAliased.copy(alias = None),
        InfluxQL.Agg("min", "v", None), None))))
    // ...and the parser now rejects inner AS in atan2 (HwRe/TaRe style),
    // so parse∘print is a fixpoint over everything parse accepts
    intercept[IllegalArgumentException](InfluxQL.parse(
      "SELECT atan2(mean(v) AS m, mean(w)) FROM m GROUP BY time(1h)"))
    // paren-grouped forecast/TA items with an alias route through
    // withAlias — formerly a MatchError for these field kinds
    val hwParen = InfluxQL.parse(
      "SELECT (holt_winters(mean(value), 3, 0)) AS fc FROM events GROUP BY time(1h)")
    assert(hwParen.fields == Seq(InfluxQL.HoltWinters(
      InfluxQL.Agg("mean", "value", None), 3, 0, withFit = false, Some("fc"))))
    val taParen = InfluxQL.parse(
      "SELECT (relative_strength_index(mean(value), 14)) AS r FROM events GROUP BY time(1h)")
    assert(taParen.fields == Seq(InfluxQL.TechAnalysis(
      "relative_strength_index", InfluxQL.Agg("mean", "value", None), 14, Some("r"))))
  }

  test("derivative/difference/cumulative_sum match hand-built windows") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val got = InfluxQL.run(spark, m,
      "SELECT derivative(count(value), 1h) AS rate FROM events GROUP BY time(6h)")
    val agged = m.groupBy(window(col("time"), "6 hours").as("w"))
      .agg(count("value").as("n"))
      .select(col("w.start").as("time"), col("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("time")
    val want = agged
      .withColumn("rate",
        (col("n") - lag("n", 1).over(w)).cast("double") * 3600d /
          ((unix_micros(col("time")) - lag(unix_micros(col("time")), 1).over(w))
            .cast("double") / 1e6))
      .filter(col("rate").isNotNull)
      .select("time", "rate")
    assert(got.collect().toSet == want.collect().toSet)
    // cumulative_sum of the same count telescopes back to a running total
    val cs = InfluxQL.run(spark, m,
      "SELECT cumulative_sum(count(value)) AS cs FROM events GROUP BY time(6h)")
    val total = m.count().toDouble
    assert(cs.orderBy(col("time").desc).limit(1)
      .select("cs").as[Double].head() == total)
    // difference drops exactly the first bucket
    val d = InfluxQL.run(spark, m,
      "SELECT difference(count(value)) AS d FROM events GROUP BY time(6h)")
    assert(d.count() == agged.count() - 1)
  }

  test("moving_average emits only complete windows, decimal-stable") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val ma = InfluxQL.run(spark, m,
      "SELECT moving_average(mean(value), 4) AS ma FROM events GROUP BY time(6h)")
    val buckets = m.select(window(col("time"), "6 hours")).distinct().count()
    assert(ma.count() == buckets - 3, "first k-1 windows are incomplete")
  }

  test("first/last/spread/percentile aggregate semantics") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val got = InfluxQL.run(spark, m,
      "SELECT first(value) AS f, last(value) AS l, spread(value) AS sp, " +
        "percentile(value, 100) AS p100, max(value) AS mx, min(value) AS mn " +
        "FROM events GROUP BY time(1d)").collect()
    got.foreach { r =>
      val (f, l, sp) = (r.getAs[Double]("f"), r.getAs[Double]("l"),
        r.getAs[Double]("sp"))
      val (p100, mx, mn) = (r.getAs[Double]("p100"), r.getAs[Double]("mx"),
        r.getAs[Double]("mn"))
      assert(p100 == mx, "percentile(100) is the bucket max")
      assert(sp == mx - mn)
      assert(f >= mn && f <= mx && l >= mn && l <= mx)
    }
    // first = value at the earliest timestamp of each bucket
    val firstRow = m.orderBy(col("time").asc, col("value").asc).limit(1)
      .select("value").as[Double].head()
    val gotFirst = InfluxQL.run(spark, m,
      "SELECT first(value) AS f FROM events")
    assert(gotFirst.select("f").as[Double].head() == firstRow)
  }

  test("top/bottom selectors return extreme points with event times") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val top3 = InfluxQL.run(spark, m, "SELECT top(value, 3) AS v FROM events")
      .select("v").as[Double].collect().toSeq
    val want = m.select("value").as[Double].collect().sorted.reverse.take(3)
    assert(top3.sorted.reverse == want.toSeq)
    val bot = InfluxQL.run(spark, m,
      "SELECT bottom(value, 2) AS v FROM events GROUP BY event_type")
    val kinds = m.select("event_type").distinct().count()
    assert(bot.count() == kinds * 2)
  }

  test("parser rejects unsupported statements") {
    intercept[IllegalArgumentException](InfluxQL.parse("DROP MEASUREMENT flow"))
    intercept[IllegalArgumentException](InfluxQL.parse("DELETE FROM events"))
    // difference takes no argument; moving_average needs an integer size
    intercept[IllegalArgumentException](
      InfluxQL.parse("SELECT difference(mean(value), 3) FROM events"))
    intercept[IllegalArgumentException](
      InfluxQL.parse("SELECT moving_average(mean(value)) FROM events"))
    // transforms wrap aggregates, not raw fields or selectors
    intercept[IllegalArgumentException](
      InfluxQL.parse("SELECT derivative(top(value, 3)) FROM events"))
  }

  test("parser handles percentile, transforms and selectors") {
    val q = InfluxQL.parse(
      "SELECT derivative(mean(value), 1h) AS rate, " +
        "moving_average(percentile(value, 90), 4) FROM events " +
        "GROUP BY time(6h), event_type")
    assert(q.fields == Seq(
      InfluxQL.Transform("derivative",
        InfluxQL.Agg("mean", "value", None), Some("1h"), Some("rate")),
      InfluxQL.Transform("moving_average",
        InfluxQL.Agg("percentile", "value", None, Some(90.0)), Some("4"), None)))
    val s = InfluxQL.parse("SELECT bottom(value, 2) AS low FROM events GROUP BY event_type")
    assert(s.fields == Seq(InfluxQL.Selector("bottom", "value", 2, Some("low"))))
    assert(s.groupTags == Seq("event_type"))
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

  test("compact recovery heals every interrupted-swap state") {
    import java.nio.file.{Files => JFiles, Paths}
    val root = JFiles.createTempDirectory("ms_recover").toString
    val store = new graft.store.MeasurementStore(spark, root)
    val points = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("m", points)
    store.append("m", points)
    val expected = store.read("m").count()
    val days = new java.io.File(s"$root/m").listFiles()
      .filter(_.getName.startsWith("day=")).map(_.getName.stripPrefix("day="))
      .sorted
    assert(days.length >= 3, "need 3 days to simulate 3 crash states")
    val Array(d1, d2, d3) = days.take(3)
    def mv(from: String, to: String): Unit =
      JFiles.move(Paths.get(s"$root/m/$from"), Paths.get(s"$root/m/$to"))
    // state A: crashed between the two renames, rewrite complete —
    // day dir gone, .old_ + .compact_ (with _SUCCESS) on disk
    spark.read.parquet(s"$root/m/day=$d1").coalesce(1)
      .write.parquet(s"$root/m/.compact_$d1")
    mv(s"day=$d1", s".old_$d1")
    // state B: crashed before the old-dir delete — day live, .old_ spare
    spark.read.parquet(s"$root/m/day=$d2").coalesce(1)
      .write.parquet(s"$root/m/.old_tmp_$d2")
    mv(s".old_tmp_$d2", s".old_$d2")
    // state C: crashed mid-rewrite — day live, partial .compact_ (no _SUCCESS)
    JFiles.createDirectory(Paths.get(s"$root/m/.compact_$d3"))
    JFiles.writeString(Paths.get(s"$root/m/.compact_$d3/part-junk.parquet"), "x")
    store.recoverCompaction("m")
    val names = new java.io.File(s"$root/m").listFiles().map(_.getName).toSet
    assert(!names.exists(n => n.startsWith(".old_") || n.startsWith(".compact_")),
      s"spare dirs must be gone: $names")
    assert(store.read("m").count() == expected,
      "recovery must preserve every row")
    // and a fresh compact over the healed store still works
    val report = store.compact("m")
    assert(report.map(_._1).toSet == days.toSet)
  }

  test("ORDER BY time DESC orders output even without LIMIT") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val rows = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d) " +
        "ORDER BY time DESC")
      .select("time").as[java.sql.Timestamp].collect()
    assert(rows.length > 1)
    assert(rows.sliding(2).forall { case Array(a, b) => !a.before(b) },
      "buckets must be in descending time order")
  }

  test("LIMIT with GROUP BY tags caps points per series, not globally") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val out = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d), event_type " +
        "ORDER BY time DESC LIMIT 3")
    val perSeries = out.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val nTypes = m.select("event_type").distinct().count()
    assert(perSeries.size == nTypes, "every series must survive the limit")
    assert(perSeries.values.forall(_ == 3), s"3 rows per series: $perSeries")
    // and they are each series' newest buckets
    val newest = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d), event_type")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("time").desc)))
      .filter(col("rn") <= 3).drop("rn")
    assert(out.select("time", "event_type", "n").collect().toSet ==
      newest.select("time", "event_type", "n").collect().toSet)
  }

  test("raw select under GROUP BY tag keeps the tag and limits per series") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val out = InfluxQL.run(spark, m,
      "SELECT value FROM events GROUP BY event_type ORDER BY time DESC LIMIT 3")
    assert(out.columns.toSeq == Seq("time", "event_type", "value"))
    val perSeries = out.groupBy("event_type").count().as[(String, Long)]
      .collect().toMap
    val nTypes = m.select("event_type").distinct().count()
    assert(perSeries.size == nTypes && perSeries.values.forall(_ == 3),
      s"3 newest points per series: $perSeries")
    // selecting the tag explicitly doesn't duplicate the column
    val dup = InfluxQL.run(spark, m,
      "SELECT event_type, value FROM events GROUP BY event_type LIMIT 1")
    assert(dup.columns.count(_ == "event_type") == 1)
  }

  test("DROP SERIES removes one series across all time; others untouched") {
    val root = java.nio.file.Files.createTempDirectory("ms_dropser").toString
    val store = new graft.store.MeasurementStore(spark, root)
    val pts = Tables.load(spark, sf, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("m", pts)
    val errorRows = pts.filter(col("event_type") === "error").count()
    val total = pts.count()
    assert(errorRows > 0, "fixture must contain the series")
    val rewritten = store.dropSeries(
      "DROP SERIES FROM m WHERE event_type = 'error'")
    assert(rewritten.nonEmpty)
    val back = store.read("m")
    assert(back.filter(col("event_type") === "error").count() == 0)
    assert(back.count() == total - errorRows,
      "only the matched series is removed")
    // crash-safe swap leaves no spare dirs behind
    val names = new java.io.File(s"$root/m").listFiles().map(_.getName)
    assert(!names.exists(n => n.startsWith(".old_") || n.startsWith(".compact_")))
    // dropping a series that isn't there rewrites nothing
    assert(store.dropSeries(
      "DROP SERIES FROM m WHERE event_type = 'nope'").isEmpty)
  }

  test("DROP MEASUREMENT removes the series; others untouched") {
    val root = java.nio.file.Files.createTempDirectory("ms_drop").toString
    val store = new graft.store.MeasurementStore(spark, root)
    val pts = Tables.load(spark, sf, "events").limit(100)
      .select(col("event_type"), col("ts").as("time"), col("value"))
    store.append("a", pts)
    store.append("b", pts)
    assert(store.dropMeasurement("DROP MEASUREMENT a"))
    assert(!new java.io.File(s"$root/a").exists())
    assert(store.read("b").count() == 100)
    assert(!store.dropMeasurement("DROP MEASUREMENT a"), "second drop is a no-op")
  }

  test("distinct() emits unique values per bucket; mode() picks most frequent") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val d = InfluxQL.run(spark, m,
      "SELECT distinct(user_id) AS u FROM events GROUP BY time(1d)")
    val want = m.select(date_trunc("DAY", col("time")).as("time"),
      col("user_id").as("u")).distinct()
    assert(d.collect().toSet == want.collect().toSet)
    // mode: most frequent value per bucket; ties resolve to the lowest
    val md = InfluxQL.run(spark, m,
      "SELECT mode(user_id) AS mo FROM events GROUP BY time(1d)")
    val counts = m.groupBy(date_trunc("DAY", col("time")).as("time"),
      col("user_id")).count()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("time")
      .orderBy(col("count").desc, col("user_id").asc)
    val wantMode = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("time"), col("user_id").as("mo"))
    assert(md.collect().toSet == wantMode.collect().toSet)
    // ungrouped distinct carries the epoch timestamp, as InfluxDB does
    val dg = InfluxQL.run(spark, m, "SELECT distinct(event_type) AS t FROM events")
    assert(dg.select("time").distinct().as[java.sql.Timestamp].head() ==
      java.sql.Timestamp.valueOf("1970-01-01 00:00:00"))
    assert(dg.count() == m.select("event_type").distinct().count())
    // InfluxDB rejects mixing distinct/mode with other select items
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT distinct(user_id), mean(value) FROM events"))
  }

  test("fill(<number>) fills empty buckets with the literal") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val filled = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-03 00:00:00' " +
        "GROUP BY time(12h), event_type fill(100)")
    assert(filled.filter(col("n").isNull).count() == 0, "no nulls survive")
    val unfilled = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-03 00:00:00' " +
        "GROUP BY time(12h), event_type fill(null)")
    val holes = unfilled.filter(col("n").isNull).count()
    assert(filled.filter(col("n") === 100).count() >= holes,
      "every empty bucket takes the literal")
  }

  test("GROUP BY time(1d, 6h) shifts bucket boundaries to 06:00") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val out = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d, 6h)")
    val starts = out.select(hour(col("time"))).distinct()
      .as[Int].collect().toSet
    assert(starts == Set(6), s"every bucket starts at 06:00, got $starts")
    // total points are conserved across the shifted buckets
    assert(out.agg(sum("n")).as[Long].head() == m.count())
    // negative offsets normalize modularly: time(1d, -18h) == time(1d, 6h)
    val neg = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d, -18h)")
    assert(neg.collect().toSet == out.collect().toSet)
    // under tz() the shift applies in the LOCAL frame: daily-from-local-
    // 06:00 buckets are 13:00 UTC in Denver's winter (UTC−7)
    val tzOff = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d, 6h) tz('America/Denver')")
    val tzStarts = tzOff.select(hour(col("time"))).distinct()
      .as[Int].collect().toSet
    assert(tzStarts == Set(13), s"local 06:00 = 13:00 UTC, got $tzStarts")
    assert(tzOff.agg(sum("n")).as[Long].head() == m.count())
  }

  test("FROM /regex/ unions per-measurement results with a measurement column") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = Seq("events" -> m,
      "events_clicks" -> m.filter(col("event_type") === "click"))
    val out = InfluxQL.runCatalog(spark, cat,
      "SELECT count(value) AS n FROM /^events/ GROUP BY time(1d)")
    assert(out.columns.head == "measurement")
    val byMeas = out.groupBy("measurement").agg(sum("n")).as[(String, Long)]
      .collect().toMap
    assert(byMeas("events") == m.count())
    assert(byMeas("events_clicks") ==
      m.filter(col("event_type") === "click").count())
    // plain FROM resolves from the catalog too; unknown names fail loudly
    assert(InfluxQL.runCatalog(spark, cat,
      "SELECT count(value) AS n FROM events_clicks").as[Long].head() ==
      byMeas("events_clicks"))
    intercept[IllegalArgumentException](
      InfluxQL.runCatalog(spark, cat, "SELECT value FROM /nomatch/"))
  }

  test("math functions: per-point on fields, post-aggregation on aggregates") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val raw = InfluxQL.run(spark, m,
      "SELECT abs(value - 500) AS av, round(sqrt(value)) AS rs FROM events")
    val wantRaw = m.select(col("time"), abs(col("value") - 500.0).as("av"),
      round(sqrt(col("value")), 0).as("rs"))
    assert(raw.collect().toSet == wantRaw.collect().toSet)
    val agg = InfluxQL.run(spark, m,
      "SELECT floor(mean(value)) AS fm FROM events GROUP BY time(1d)")
    val wantAgg = m.groupBy(date_trunc("DAY", col("time")).as("time"))
      .agg(floor(Tables.davg(col("value"))).cast("double").as("fm"))
    assert(agg.select("time", "fm").collect().toSet ==
      wantAgg.select("time", "fm").collect().toSet)
    // floor/ceil keep the float wire type (InfluxDB semantics), not BIGINT
    assert(agg.schema("fm").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // default column name is the outermost function's
    val named = InfluxQL.run(spark, m, "SELECT abs(value) FROM events")
    assert(named.columns.toSeq == Seq("time", "abs"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT abs(distinct(value)) FROM events"))
    // transcendentals run too (InfluxQL parity), but stay OUT of the
    // differential oracle — their last ulp varies by libm, so they are
    // spec-gated against scala.math in the dedicated test instead
    assert(InfluxQL.run(spark, m, "SELECT ln(value) FROM events").count() > 0)
  }

  test("epoch-duration time bounds equal their quoted-timestamp form") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val epoch = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= 1704153600s AND time < 1704326400s GROUP BY time(6h)")
    val quoted = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-04 00:00:00' " +
        "GROUP BY time(6h)")
    assert(epoch.collect().toSet == quoted.collect().toSet)
    // Grafana's default filter form: epoch-MILLIS with the ms suffix
    val ms = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= 1704153600000ms AND time < 1704326400000ms " +
        "GROUP BY time(6h)")
    assert(ms.collect().toSet == quoted.collect().toSet)
    // InfluxDB's native precision: a BARE integer is epoch-nanoseconds
    val ns = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= 1704153600000000000 AND time < 1704326400000000000 " +
        "GROUP BY time(6h)")
    assert(ns.collect().toSet == quoted.collect().toSet)
    // sub-second instants survive the normalization (µs fraction kept)
    val subSec = InfluxQL.parse(
      "SELECT count(value) AS n FROM events WHERE time >= 1704153600500ms")
    assert(subSec.conds.head.value ==
      Left("2024-01-02 00:00:00.500000"))
    // RFC3339 quoted timestamps (InfluxQL's documented literal form)
    val rfc = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events " +
        "WHERE time >= '2024-01-02T00:00:00Z' AND time < '2024-01-04T00:00:00Z' " +
        "GROUP BY time(6h)")
    assert(rfc.collect().toSet == quoted.collect().toSet)
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

  test("distinct/mode reject wrappers and fill() loudly, never MatchError") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    // arithmetic / transform / math wrappers around distinct() or mode()
    // must fail the same clean way every other invalid shape does
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT distinct(value) * 2 FROM events"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT moving_average(distinct(value), 2) FROM events"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT abs(mode(value)) FROM events"))
    // fill() has no defined meaning for a value-set result: loud, not ignored
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT distinct(value) FROM events GROUP BY time(1d) fill(0)"))
    // fill(none) is the explicit no-op and stays allowed
    assert(InfluxQL.run(spark, m,
      "SELECT distinct(event_type) FROM events GROUP BY time(1d) fill(none)")
      .count() > 0)
    // fill() under selectors / elapsed / integral has no densify-then-
    // transform meaning — loud, never silently dropped
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT top(value, 3) FROM events GROUP BY time(1d) fill(0)"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT integral(value, 1h) FROM events GROUP BY time(1d) fill(0)"))
  }

  test("histogram(): bins partition each bucket; invalid shapes reject loudly") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val q = "SELECT histogram(\"value\", 0, 200, 20) AS n FROM events " +
      "GROUP BY time(1d), event_type"
    val hist = InfluxQL.run(spark, m, q)
    assert(hist.columns.toSeq ===
      Seq("time", "event_type", "bin_lo", "bin_hi", "n"))
    // clamped edge bins: per (bucket, tag) the bin counts sum to the
    // bucket's point count — nothing silently dropped
    val sums = hist.groupBy(col("time"), col("event_type"))
      .agg(sum(col("n")).as("hn"))
    val truth = m.groupBy(
        date_trunc("DAY", col("time")).as("time"), col("event_type"))
      .agg(count(lit(1)).as("cn"))
    val joined = sums.join(truth, Seq("time", "event_type"), "full_outer")
    assert(joined.filter(col("hn").isNull || col("cn").isNull ||
      col("hn") =!= col("cn")).count() === 0)
    // parse(print) round-trip for the new select item
    val p = InfluxQL.parse(q)
    assert(InfluxQL.parse(InfluxQL.print(p)) === p)
    // loud rejections: fill(), co-select-items, degenerate ranges
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT histogram(value, 0, 200, 20) FROM events " +
        "GROUP BY time(1d) fill(0)"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT histogram(value, 0, 200, 20), mean(value) FROM events"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT histogram(value, 200, 0, 20) FROM events"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT histogram(value, 0, 200, 0) FROM events"))
  }

  test("fill() + transform: derivative over a LOCF plateau is zero") {
    import spark.implicits._
    // one series with a 3-bucket gap: 00:00 → 10, (gap, gap), 18:00 → 40
    val m = Seq(("2024-01-01 00:30:00", 10.0), ("2024-01-01 18:30:00", 40.0))
      .map { case (t, v) => (java.sql.Timestamp.valueOf(t), "a", v) }
      .toDF("time", "tag", "value")
    val out = InfluxQL.run(spark, m,
      "SELECT derivative(mean(value), 6h) AS rate FROM m " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-02 00:00:00' " +
        "GROUP BY time(6h), tag fill(previous)")
      .collect().map(r => r.getAs[java.sql.Timestamp]("time").toString ->
        r.getAs[Double]("rate")).toMap
    // filled plateau derives to 0; the real jump derives to 40-10 = 30
    assert(out == Map(
      "2024-01-01 06:00:00.0" -> 0.0,
      "2024-01-01 12:00:00.0" -> 0.0,
      "2024-01-01 18:00:00.0" -> 30.0))
  }

  test("duplicate math-fn default names disambiguate as fn, fn_1") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val df = InfluxQL.run(spark, m,
      "SELECT abs(value), abs(value - 500) FROM events " +
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-02 06:00:00'")
    assert(df.columns.toSeq == Seq("time", "abs", "abs_1"))
    // aggregate path too
    // (the bucketed agg path appends `time` after the aggregation)
    val agg = InfluxQL.run(spark, m,
      "SELECT floor(mean(value)), floor(max(value)) FROM events GROUP BY time(1d)")
    assert(agg.columns.toSeq == Seq("floor", "floor_1", "time"))
  }

  test("fill() under tz(): local-midnight spine, DST day spans 23 UTC hours") {
    import spark.implicits._
    // one point per UTC day around the 2024-03-10 US spring-forward
    val m = Seq(
      (java.sql.Timestamp.valueOf("2024-03-09 12:00:00"), 1.0),
      (java.sql.Timestamp.valueOf("2024-03-11 12:00:00"), 3.0))
      .toDF("time", "value")
    val filled = InfluxQL.run(spark, m,
      "SELECT mean(value) AS mv FROM m " +
        "WHERE time >= '2024-03-09 08:00:00' AND time < '2024-03-12 08:00:00' " +
        "GROUP BY time(1d) fill(previous) tz('America/Denver')")
    val times = filled.select("time").collect().map(_.getTimestamp(0)).sorted
    // spine = Denver local midnights: 07:00 UTC before the transition,
    // 06:00 UTC after — the DST day itself spans 23 UTC hours
    assert(times.map(_.toString).toSeq == Seq(
      "2024-03-09 07:00:00.0", "2024-03-10 07:00:00.0",
      "2024-03-11 06:00:00.0", "2024-03-12 06:00:00.0"))
    // LOCF carries the 03-09 value across the empty 03-10 local day
    val byTime = filled.collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(1)).toMap
    assert(byTime("2024-03-10 07:00:00.0") == 1.0)
    assert(byTime("2024-03-11 06:00:00.0") == 3.0)
  }

  test("distinct buckets pre-1970 timestamps like every other aggregate path") {
    import spark.implicits._
    val m = Seq(
      (java.sql.Timestamp.valueOf("1969-12-31 22:00:00"), 1.0),
      (java.sql.Timestamp.valueOf("1969-12-31 23:30:00"), 2.0),
      (java.sql.Timestamp.valueOf("1970-01-01 01:00:00"), 3.0))
      .toDF("time", "value")
    val viaDistinct = InfluxQL.run(spark, m,
      "SELECT distinct(value) FROM m GROUP BY time(1d)")
      .select("time").distinct().collect().map(_.getTimestamp(0)).toSet
    val viaMean = InfluxQL.run(spark, m,
      "SELECT mean(value) AS mv FROM m GROUP BY time(1d)")
      .select("time").collect().map(_.getTimestamp(0)).toSet
    // truncate-toward-zero would put the 1969 points in the 1970-01-01
    // bucket on the distinct path only; floor-division keeps the paths equal
    assert(viaDistinct == viaMean)
    assert(viaDistinct.contains(java.sql.Timestamp.valueOf("1969-12-31 00:00:00")))
  }

  test("field arithmetic: left-associative, kind mixing rejected") {
    import spark.implicits._
    val m = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 3.0, 2.0))
      .toDF("time", "a", "b", "c")
    // a - b - c must be (a - b) - c = 5, not a - (b - c) = 9
    val out = InfluxQL.run(spark, m, "SELECT a - b - c AS x FROM m")
    assert(out.select("x").head.getDouble(0) == 5.0)
    // division runs in double even over integer-typed fields
    val ints = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, 2L))
      .toDF("time", "p", "q")
    assert(InfluxQL.run(spark, ints, "SELECT p / q AS r FROM m")
      .select("r").head.getDouble(0) == 0.5)
    // math fns compose with field arithmetic in both nesting orders
    assert(InfluxQL.run(spark, m, "SELECT abs(c - a) AS d FROM m")
      .select("d").head.getDouble(0) == 8.0)
    assert(InfluxQL.run(spark, m, "SELECT abs(a) - abs(b) AS d FROM m")
      .select("d").head.getDouble(0) == 7.0)
    // raw-field × aggregate arithmetic is rejected loudly, as InfluxDB does
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT mean(a) + b FROM m GROUP BY time(1d)"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT distinct(a) + distinct(b) FROM m"))
  }

  test("::field / ::tag disambiguators parse as their bare columns") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val typed = InfluxQL.run(spark, m,
      """SELECT mean("value"::field) AS mv FROM events """ +
        """WHERE "event_type"::tag = 'click' """ +
        """GROUP BY time(1d), "event_type"::tag""")
    val bare = InfluxQL.run(spark, m,
      "SELECT mean(value) AS mv FROM events " +
        "WHERE event_type = 'click' GROUP BY time(1d), event_type")
    assert(typed.collect().toSeq == bare.collect().toSeq)
    // a ::tag INSIDE a single-quoted literal is data, not a disambiguator:
    // comparing against 'click::tag' must NOT silently strip to 'click'
    assert(InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events WHERE event_type = 'click::tag'")
      .select("n").head.getLong(0) == 0L)
    // ...while the strip outside quotes still applies in the same clause
    assert(InfluxQL.run(spark, m,
      """SELECT count(value) AS n FROM events """ +
        """WHERE "event_type"::tag = 'click'""")
      .select("n").head.getLong(0) > 0L)
    // the ::float cast form stays unsupported, loudly
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT value::float FROM events"))
    // a ::tag inside a DOUBLE-quoted identifier is part of the name —
    // rejected loudly as an unknown item, never silently stripped to
    // select the wrong column
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT \"value::tag\" FROM events"))
  }

  test("holt_winters: deterministic additive forecast, bucket-spaced") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val fc = InfluxQL.run(spark, m,
      "SELECT holt_winters(mean(value), 6, 4) AS hw FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-06 00:00:00' " +
        "GROUP BY time(6h)")
    // exactly h forecast points, 6h apart, starting one bucket after the
    // last input bucket (2024-01-05 18:00 -> first forecast 2024-01-06)
    val times = fc.select("time").collect()
      .map(_.getTimestamp(0).getTime).sorted
    assert(times.length == 6)
    assert(times.head == java.sql.Timestamp.valueOf("2024-01-06 00:00:00").getTime)
    assert(times.sliding(2).forall(p => p(1) - p(0) == 6L * 3600 * 1000))
    // deterministic: a second run is bit-identical
    val fc2 = InfluxQL.run(spark, m,
      "SELECT holt_winters(mean(value), 6, 4) AS hw FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-06 00:00:00' " +
        "GROUP BY time(6h)")
    assert(fc.collect().toSeq == fc2.collect().toSeq)
    // with_fit: one fitted point per input bucket plus h forecasts, per
    // series; the non-seasonal (m=0) fold seeds fit[0] with the first value
    val wf = InfluxQL.run(spark, m,
      "SELECT holt_winters_with_fit(mean(value), 3, 0) AS hwf FROM events " +
        "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-06 00:00:00' " +
        "GROUP BY time(12h), event_type")
    // one fitted row per populated input bucket + 3 forecasts, per series
    val buckets = m
      .filter(col("time") >= "2024-01-01" && col("time") < "2024-01-06")
      .groupBy(col("event_type"),
        window(col("time"), "12 hours").getField("start"))
      .count()
      .groupBy("event_type").count().withColumnRenamed("count", "nb")
    val perSeries = wf.groupBy("event_type").count()
      .join(buckets, "event_type").collect()
    assert(perSeries.nonEmpty)
    assert(perSeries.forall(r => r.getLong(1) == r.getLong(2) + 3))
    // malformed forms fail loudly
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT holt_winters(mean(value), 6, 4) AS hw FROM events")) // no bucket
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT holt_winters(value, 6, 4) FROM events GROUP BY time(6h)"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT holt_winters(mean(value), 0, 4) FROM events GROUP BY time(6h)"))
  }

  test("technical-analysis transforms: EMA/RSI/CMO laws") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val range = "WHERE time >= '2024-01-01 00:00:00' " +
      "AND time < '2024-01-06 00:00:00' "
    // EMA emits one point per input bucket and stays within the series'
    // min/max envelope (a convex combination of inputs)
    val mean = InfluxQL.run(spark, m,
      s"SELECT mean(value) AS mv FROM events $range GROUP BY time(6h)")
    val ema = InfluxQL.run(spark, m,
      "SELECT exponential_moving_average(mean(value), 4) AS ema " +
        s"FROM events $range GROUP BY time(6h)")
    assert(ema.count() == mean.count())
    val (lo, hi) = mean.agg(min("mv"), max("mv")).as[(Double, Double)].head()
    assert(ema.filter(col("ema") < lo - 1e-9 || col("ema") > hi + 1e-9)
      .count() == 0)
    // first EMA = first bucket value (the documented seed)
    val firstIn = mean.orderBy("time").select("mv").head.getDouble(0)
    val firstOut = ema.orderBy("time").select("ema").head.getDouble(0)
    assert(math.abs(firstOut - firstIn) < 1e-6)
    // RSI is bounded in [0, 100] and emits n - N points per series
    val rsi = InfluxQL.run(spark, m,
      "SELECT relative_strength_index(mean(value), 6) AS rsi " +
        s"FROM events $range GROUP BY time(6h)")
    assert(rsi.count() == mean.count() - 6)
    assert(rsi.filter(col("rsi") < 0 || col("rsi") > 100).count() == 0)
    // CMO is bounded in [-100, 100]
    val cmo = InfluxQL.run(spark, m,
      "SELECT chande_momentum_oscillator(mean(value), 4) AS cmo " +
        s"FROM events $range GROUP BY time(6h)")
    assert(cmo.count() == mean.count() - 4)
    assert(cmo.filter(col("cmo") < -100 || col("cmo") > 100).count() == 0)
    // malformed forms fail loudly
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT exponential_moving_average(mean(value), 4) FROM events"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT relative_strength_index(value, 6) FROM events GROUP BY time(6h)"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT chande_momentum_oscillator(mean(value), 1) FROM events " +
        "GROUP BY time(6h)"))
  }

  test("sample(): seeded deterministic per-bucket selection") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val q = "SELECT sample(value, 3) AS s FROM events " +
      "WHERE time >= '2024-01-01 00:00:00' AND time < '2024-01-06 00:00:00' " +
      "GROUP BY time(1d), event_type"
    val s1 = InfluxQL.run(spark, m, q)
    // per (bucket, series): exactly min(3, points-in-bucket) rows
    val bucketed = m
      .filter(col("time") >= "2024-01-01" && col("time") < "2024-01-06")
      .groupBy(window(col("time"), "1 day").getField("start").as("b"),
        col("event_type"))
      .count().withColumnRenamed("count", "npts")
    val got = s1
      .groupBy(window(col("time"), "1 day").getField("start").as("b"),
        col("event_type"))
      .count()
      .join(bucketed, Seq("b", "event_type"))
    assert(got.filter(col("count") =!= least(lit(3L), col("npts"))).count() == 0)
    // sampled rows are actual input points
    assert(s1.join(m.select(col("time"), col("event_type"),
        col("value").as("s")),
      Seq("time", "event_type", "s"), "left_anti").count() == 0)
    // identical on every run (the seed is fixed)
    assert(s1.collect().toSeq == InfluxQL.run(spark, m, q).collect().toSeq)
    // and invariant under input row-order PERMUTATION: the rank key is a
    // pure function of (seed, time, value), never of arrival order —
    // repartitioned + reverse-sorted input selects the same points
    val shuffled = m.repartition(7, col("user_id"))
      .sortWithinPartitions(col("time").desc, col("value").desc)
    assert(s1.collect().toSeq ==
      InfluxQL.run(spark, shuffled, q).collect().toSeq)
    // and NOT the first-n-by-time degenerate pick: at least one bucket's
    // sample differs from its 3 earliest points
    val firstN = m
      .filter(col("time") >= "2024-01-01" && col("time") < "2024-01-06")
      .withColumn("b", window(col("time"), "1 day").getField("start"))
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy(col("b"), col("event_type"))
        .orderBy(col("time"), col("value"))))
      .filter(col("rn") <= 3)
      .select(col("time"), col("event_type"), col("value").as("s"))
    assert(s1.join(firstN, Seq("time", "event_type", "s"), "left_anti")
      .count() > 0)
  }

  test("wildcard aggregates expand to fn_<field> per numeric field") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val df = InfluxQL.run(spark, m, "SELECT count(*) FROM events GROUP BY time(1d)")
    assert(df.columns.sorted.toSeq ==
      Seq("count_event_id", "count_user_id", "count_value", "time"))
    // nested wildcards and aliased wildcards are rejected loudly
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT mean(*) AS x FROM events GROUP BY time(1d)"))
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT derivative(mean(*), 1h) FROM events GROUP BY time(1d)"))
  }

  test("sub-second buckets: time(500ms) splits within a second, ns rejected") {
    import spark.implicits._
    val m = Seq("2024-01-01 00:00:00.1", "2024-01-01 00:00:00.4",
        "2024-01-01 00:00:00.6", "2024-01-01 00:00:01.2")
      .map(t => (java.sql.Timestamp.valueOf(t), 1.0)).toDF("time", "value")
    val out = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM m GROUP BY time(500ms)")
      .collect().map(r => r.getAs[java.sql.Timestamp]("time").toString ->
        r.getAs[Long]("n")).toMap
    assert(out == Map(
      "2024-01-01 00:00:00.0" -> 2L,
      "2024-01-01 00:00:00.5" -> 1L,
      "2024-01-01 00:00:01.0" -> 1L))
    // explicit microsecond buckets work; nanosecond ones are below the
    // engine's timestamp precision and fail loudly
    assert(InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM m GROUP BY time(500000u)")
      .count() == 3)
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM m GROUP BY time(100ns)"))
  }

  test("GROUP BY time(1w) equals time(7d): epoch-aligned week buckets") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val w = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1w)").collect().toSet
    val d7 = InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(7d)").collect().toSet
    assert(w == d7 && w.nonEmpty)
  }

  test("transcendental math fns run and match scala.math (spec, not oracle)") {
    import spark.implicits._
    val m = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 2.0, 9.0))
      .toDF("time", "a", "b")
    def one(q: String): Double =
      InfluxQL.run(spark, m, q).select("x").head.getDouble(0)
    // same JVM ⇒ Spark's codegen and scala.math hit the same libm
    assert(one("SELECT ln(a) AS x FROM m") == math.log(2.0))
    assert(one("SELECT log2(a) AS x FROM m") == 1.0)
    assert(one("SELECT log10(b) AS x FROM m") == math.log10(9.0))
    assert(one("SELECT exp(a) AS x FROM m") == math.exp(2.0))
    assert(one("SELECT pow(a, 10) AS x FROM m") == 1024.0)
    // Spark's Logarithm folds log(x)/log(base) differently by one ulp
    assert(math.abs(one("SELECT log(b, 3) AS x FROM m") - 2.0) < 1e-12)
    assert(one("SELECT sin(a) AS x FROM m") == math.sin(2.0))
    assert(one("SELECT atan(a) AS x FROM m") == math.atan(2.0))
    // post-aggregation form and composition with arithmetic
    assert(one("SELECT ln(max(a)) AS x FROM m GROUP BY time(1d)")
      == math.log(2.0))
    assert(one("SELECT pow(a, 2) + b AS x FROM m") == 13.0)
    // atan2: the one two-FIELD math fn, raw and aggregate forms
    assert(one("SELECT atan2(a, b) AS x FROM m") == math.atan2(2.0, 9.0))
    assert(one("SELECT atan2(max(a), max(b)) AS x FROM m GROUP BY time(1d)")
      == math.atan2(2.0, 9.0))
    // kind mixing fails loudly, as with binary arithmetic
    intercept[IllegalArgumentException](
      InfluxQL.run(spark, m, "SELECT atan2(max(a), b) AS x FROM m"))
  }

  test("TA composition fns: DEMA/TEMA/TRIX/KER/KAMA laws") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val range = "WHERE time >= '2024-01-01 00:00:00' " +
      "AND time < '2024-01-06 00:00:00' "
    val mean = InfluxQL.run(spark, m,
      s"SELECT mean(value) AS mv FROM events $range GROUP BY time(6h)")
    val nb = mean.count()
    def ta(fn: String, n: Int): org.apache.spark.sql.DataFrame =
      InfluxQL.run(spark, m,
        s"SELECT $fn(mean(value), $n) AS x FROM events $range GROUP BY time(6h)")
    // emission counts: DEMA/TEMA per bucket, TRIX from the 2nd,
    // KER/KAMA from the (N+1)-th
    assert(ta("double_exponential_moving_average", 4).count() == nb)
    assert(ta("triple_exponential_moving_average", 4).count() == nb)
    assert(ta("triple_exponential_derivative", 4).count() == nb - 1)
    assert(ta("kaufmans_efficiency_ratio", 6).count() == nb - 6)
    assert(ta("kaufmans_adaptive_moving_average", 6).count() == nb - 6)
    // KER is a ratio in [0, 1]
    assert(ta("kaufmans_efficiency_ratio", 6)
      .filter(col("x") < 0 || col("x") > 1).count() == 0)
    // a CONSTANT series: DEMA/TEMA/KAMA reproduce the constant, TRIX = 0
    import spark.implicits._
    val const = (1 to 12).map(i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 $i%02d:00:00"), 5.0))
      .toDF("time", "v")
    def tc(fn: String, n: Int): Seq[Double] =
      InfluxQL.run(spark, const,
        s"SELECT $fn(mean(v), $n) AS x FROM c GROUP BY time(1h)")
        .select("x").collect().map(_.getDouble(0)).toSeq
    assert(tc("double_exponential_moving_average", 3).forall(_ == 5.0))
    assert(tc("triple_exponential_moving_average", 3).forall(_ == 5.0))
    assert(tc("triple_exponential_derivative", 3).forall(_ == 0.0))
    assert(tc("kaufmans_adaptive_moving_average", 3).forall(_ == 5.0))
    assert(tc("kaufmans_efficiency_ratio", 3).forall(_ == 0.0)) // 0/0 -> 0
  }

  test("field arithmetic: * and / bind tighter than + and -") {
    import spark.implicits._
    val m = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 10.0, 4.0, 2.0))
      .toDF("time", "a", "b", "c")
    def one(q: String): Double =
      InfluxQL.run(spark, m, q).select("x").head.getDouble(0)
    // a + b * c = 10 + 8 = 18, not (10 + 4) * 2 = 28
    assert(one("SELECT a + b * c AS x FROM m") == 18.0)
    // a - b / c = 10 - 2 = 8, not (10 - 4) / 2 = 3
    assert(one("SELECT a - b / c AS x FROM m") == 8.0)
    // literal right under mixed precedence: a - b * 2 = 10 - 8 = 2
    assert(one("SELECT a - b * 2 AS x FROM m") == 2.0)
    // and a * 2 - b = 20 - 4 = 16 (literal inside the tighter tier)
    assert(one("SELECT a * 2 - b AS x FROM m") == 16.0)
    // explicit parens override: (a - b) / c = 3
    assert(one("SELECT (a - b) / c AS x FROM m") == 3.0)
    // same tier stays left-associative: a / b / c = 1.25
    assert(one("SELECT a / b / c AS x FROM m") == 1.25)
    // aggregate shape from the ADVICE report: mean + mean / 2
    val agg = InfluxQL.run(spark, m,
      "SELECT max(a) + max(b) / 2 AS x FROM m GROUP BY time(1d)")
    assert(agg.select("x").head.getDouble(0) == 12.0)
    // a bare numeric operand is rejected loudly, not read as a field
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      "SELECT a + 2 * b AS x FROM m"))
    // a zero divisor yields NULL (DuckDB's double division; the InfluxDB
    // analog drops the point) — not ANSI mode's runtime error
    val z = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 7.0, 0.0))
      .toDF("time", "a", "b")
    assert(InfluxQL.run(spark, z, "SELECT a / b AS x FROM m")
      .select("x").head.isNullAt(0))
  }

  test("Graft facade: the reference dialogue end to end") {
    val g = Graft(spark)
    g.statement("CREATE DATABASE ciwsdb")
    g.register("ciwsdb", "events",
      Tables.load(spark, sf, "events").withColumnRenamed("ts", "time"))
    // the Grafana handshake: databases → retention policies → measurements
    assert(g.statement("SHOW DATABASES").collect().map(_.getString(0)).toSeq
      == Seq("ciwsdb"))
    assert(g.statement("SHOW RETENTION POLICIES ON ciwsdb").count() == 1)
    assert(g.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSeq == Seq("events"))
    // a data query with the full dialect through the same front door
    val daily = g.statement(
      "SELECT count(value) AS n, max(value) - min(value) AS vrange " +
        "FROM events GROUP BY time(1d)")
    assert(daily.count() > 0)
    // custom Catalyst surface registered by construction
    assert(spark.sql("SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head.getDouble(0) == 11.0)
    // SELECT INTO registers its result as a queryable measurement
    g.statement("SELECT mean(value) AS mv INTO daily_mean FROM events " +
      "GROUP BY time(1d), event_type")
    assert(g.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSeq == Seq("daily_mean", "events"))
    assert(g.statement("SELECT count(mv) AS n FROM daily_mean").count() == 1)
    OpCaches.releaseAll()
  }

  test("Graft facade: multi-statement batch (CLI parity)") {
    val g = Graft(spark)
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    g.statement("CREATE DATABASE batchdb")
    g.register("batchdb", "m", m)
    // a CLI-style batch: each statement runs in order, the LAST result
    // comes back (USE switches the current db before the SELECT resolves)
    val out = g.statement(
      "USE batchdb; SELECT count(value) AS n FROM m GROUP BY time(1d)")
    assert(out.count() > 0)
    // a ';' inside a string literal does not split
    assert(g.statement(
      "SELECT count(value) AS n FROM m WHERE event_type != 'a;b' " +
        "GROUP BY time(1d)").count() > 0)
    // a ';' before END stays inside the CQ body, and the batch continues
    // past it: CREATE CQ then SHOW in one round trip
    val cqs = g.statement(
      "CREATE CONTINUOUS QUERY cq_batch ON batchdb BEGIN " +
        "SELECT count(value) AS n INTO t FROM m GROUP BY time(1d); END; " +
        "SHOW CONTINUOUS QUERIES")
    assert(cqs.select("name").collect().map(_.getString(0)).toSeq
      == Seq("cq_batch"))
    // empty batches fail loudly
    intercept[IllegalArgumentException](g.statement(" ; ; "))
    // a ';' inside a /regex/ measurement literal does not split — after
    // FROM, after a FROM-list comma, and after =~ in WHERE
    assert(Graft.splitStatements("SELECT mean(v) FROM /a;b/ GROUP BY time(1d)")
      == Seq("SELECT mean(v) FROM /a;b/ GROUP BY time(1d)"))
    assert(Graft.splitStatements(
      """SELECT n FROM "m", /x;y/; SELECT 1""").size == 2)
    assert(Graft.splitStatements(
      "SELECT v FROM m WHERE host =~ /web;[0-9]\\/2/; SHOW DATABASES")
      == Seq("SELECT v FROM m WHERE host =~ /web;[0-9]\\/2/",
        "SHOW DATABASES"))
    // division never opens a regex run: ';' after a '/' operand still splits
    assert(Graft.splitStatements("SELECT a / b FROM m; SELECT 1").size == 2)
    OpCaches.releaseAll()
  }

  test("INTO rp.:MEASUREMENT fans out one target per source measurement") {
    val g = Graft(spark)
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    g.statement("CREATE DATABASE backrefdb; USE backrefdb")
    g.register("backrefdb", "ciws_a",
      m.filter(col("event_type") === "click"))
    g.register("backrefdb", "ciws_b",
      m.filter(col("event_type") === "view"))
    g.register("backrefdb", "other", m.filter(col("event_type") === "error"))
    g.statement("SELECT mean(value) AS mv INTO \"weekly\".:MEASUREMENT " +
      "FROM /^ciws_/ GROUP BY time(1d)")
    // both regex matches got their own target; the non-match did not
    val names = g.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSet
    assert(names.contains("weekly.ciws_a") && names.contains("weekly.ciws_b"))
    assert(!names.contains("weekly.other"))
    // each target holds ITS source's aggregate (no cross-contamination)
    val a = g.statement("SELECT mv FROM \"weekly.ciws_a\"")
    val direct = InfluxQL.run(spark, m.filter(col("event_type") === "click"),
      "SELECT mean(value) AS mv FROM x GROUP BY time(1d)")
    assert(a.select("mv").collect().map(_.getDouble(0)).sorted.toSeq
      == direct.select("mv").collect().map(_.getDouble(0)).sorted.toSeq)
    // a bare backreference is rejected loudly
    intercept[IllegalArgumentException](g.statement(
      "SELECT mean(value) AS mv INTO :MEASUREMENT FROM /^ciws_/ " +
        "GROUP BY time(1d)"))
    OpCaches.releaseAll()
  }

  test("INTO fan-out keys on query shape; empty sources get no target") {
    val g = Graft(spark)
    g.statement("CREATE DATABASE shapedb; USE shapedb")
    // a source whose DATA has a column literally named 'measurement' must
    // not be mistaken for a multi-source union frame (the fan-out key is
    // the parsed FROM shape, not a column sniff)
    val m = Tables.load(spark, sf, "events").limit(50)
      .select(col("ts").as("time"), col("value"),
        col("event_type").as("measurement"))
    g.register("shapedb", "src", m)
    g.statement("SELECT * INTO t1 FROM src")
    // the user column survives INTO; exactly one target was registered
    assert(g.statement("SELECT * FROM t1").columns.contains("measurement"))
    val names1 = g.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSet
    assert(names1.contains("t1"))
    assert(!names1.exists(_.startsWith("t1.")))
    // a FROM-matched source contributing ZERO rows gets no empty target
    // (target names derive from the result's distinct source values,
    // matching the store tier / InfluxDB)
    val ev = Tables.load(spark, sf, "events")
      .select(col("ts").as("time"), col("value"))
    g.register("shapedb", "ciws_live", ev.limit(40))
    g.register("shapedb", "ciws_dead", ev.limit(0))
    g.statement("SELECT mean(value) AS mv INTO \"w\".:MEASUREMENT " +
      "FROM /^ciws_/ GROUP BY time(1d)")
    val names2 = g.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSet
    assert(names2.contains("w.ciws_live"))
    assert(!names2.contains("w.ciws_dead"))
    // a dot inside a QUOTED INTO identifier would collide with the dotted
    // path key after quote stripping — rejected loudly
    intercept[IllegalArgumentException](
      g.statement("SELECT value INTO \"a.b\" FROM src"))
    OpCaches.releaseAll()
  }

  test("single-measurement INTO backref resolves to rp.<measurement>") {
    import java.nio.file.{Files, Paths}
    val root = Files.createTempDirectory("backref_single").toString
    val store = new graft.store.MeasurementStore(spark, root)
    val m = Tables.load(spark, sf, "events")
      .select(col("ts").as("time"), col("value")).limit(100)
    store.append("m1", m)
    store.influxql("m1", "SELECT mean(value) AS mv " +
      "INTO \"weekly\".:MEASUREMENT FROM m1 GROUP BY time(1d)")
    assert(store.measurementNames.contains("weekly.m1"))
    // no literal ':MEASUREMENT' directory, and the bare form fails loudly
    assert(!store.measurementNames.exists(_.contains(":MEASUREMENT")))
    intercept[IllegalArgumentException](store.influxql("m1",
      "SELECT mean(value) AS mv INTO :MEASUREMENT FROM m1 GROUP BY time(1d)"))
    // a non-matching (file-less) measurement dir neither fails nor costs a
    // read for a statement that never touches it
    Files.createDirectory(Paths.get(root, "junk_empty"))
    assert(store.influxqlAll(
      "SELECT mean(value) AS mv FROM /^m1$/ GROUP BY time(1d)").count() > 0)
  }

  test("catalog DELETE / DROP SERIES / DROP MEASUREMENT statements") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = new graft.influxql.MeasurementCatalog(spark)
    cat.statement("CREATE DATABASE muta")
    cat.register("muta", "ev", m)
    val total = m.count()
    val clicksEarly = m.filter(col("event_type") === "click" &&
      col("time") < "2024-01-03").count()
    assert(clicksEarly > 0)
    // DELETE with a time+tag bound removes exactly that slice
    assert(cat.statement("DELETE FROM ev WHERE event_type = 'click' " +
      "AND time < '2024-01-03 00:00:00'").count() == 0) // Influx empty result
    assert(cat.statement("SELECT count(value) AS n FROM ev")
      .select("n").head.getLong(0) == total - clicksEarly)
    // DROP SERIES removes the whole series
    val errors = m.filter(col("event_type") === "error").count()
    cat.statement("DROP SERIES FROM ev WHERE event_type = 'error'")
    assert(cat.statement("SELECT count(value) AS n FROM ev")
      .select("n").head.getLong(0) == total - clicksEarly - errors)
    // bare DELETE empties but keeps the measurement queryable
    cat.statement("DELETE FROM ev")
    assert(cat.statement("SELECT count(value) AS n FROM ev")
      .select("n").head.getLong(0) == 0)
    // DROP MEASUREMENT removes it; unknown names fail loudly
    cat.statement("DROP MEASUREMENT ev")
    intercept[IllegalArgumentException](
      cat.statement("SELECT count(value) AS n FROM ev"))
    intercept[IllegalArgumentException](
      cat.statement("DROP MEASUREMENT nosuch"))
    intercept[IllegalArgumentException](
      cat.statement("DELETE FROM nosuch"))
    // NULL-safe complement: a row the predicate cannot match (NULL tag)
    // survives a tag-equality DELETE
    import spark.implicits._
    val withNull = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), null, 2.0))
      .toDF("time", "event_type", "value")
    cat.register("muta", "nn", withNull)
    cat.statement("DELETE FROM nn WHERE event_type = 'click'")
    assert(cat.statement("SELECT count(value) AS n FROM nn")
      .select("n").head.getLong(0) == 1)
  }

  test("measurement catalog: create/use/drop database lifecycle") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = new graft.influxql.MeasurementCatalog(spark)
    // DDL returns Influx's empty result; SHOW DATABASES lists names sorted
    assert(cat.statement("CREATE DATABASE ciwsdb").count() == 0)
    cat.statement("CREATE DATABASE staging")
    assert(cat.statement("SHOW DATABASES").collect().map(_.getString(0)).toSeq
      == Seq("ciwsdb", "staging"))
    // CREATE is idempotent — re-creating never drops measurements
    cat.register("ciwsdb", "events", m)
    cat.statement("CREATE DATABASE ciwsdb")
    assert(cat.measurements("ciwsdb").map(_._1) == Seq("events"))
    // the first database created is current: SELECT resolves against it
    val n = cat.statement(
      "SELECT count(value) AS n FROM events GROUP BY time(1d)").count()
    assert(n > 0)
    // metadata queries route through the same front door
    assert(cat.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSeq == Seq("events"))
    // USE switches; querying a measurement not in the new db fails loudly
    cat.statement("USE staging")
    intercept[IllegalArgumentException](
      cat.statement("SELECT count(value) AS n FROM events GROUP BY time(1d)"))
    // DROP removes; current falls back to the first remaining database
    cat.statement("DROP DATABASE staging")
    assert(cat.statement("SHOW DATABASES").collect().map(_.getString(0)).toSeq
      == Seq("ciwsdb"))
    assert(cat.statement("SHOW MEASUREMENTS")
      .collect().map(_.getString(0)).toSeq == Seq("events"))
    intercept[IllegalArgumentException](cat.use("nosuch"))
    // CONTINUOUS QUERY management routes through the same front door
    cat.statement("CREATE CONTINUOUS QUERY cq1 ON ciwsdb BEGIN " +
      "SELECT mean(value) AS mv INTO hourly FROM events GROUP BY time(1h) END")
    assert(cat.statement("SHOW CONTINUOUS QUERIES")
      .select("name").collect().map(_.getString(0)).toSeq == Seq("cq1"))
    cat.statement("DROP CONTINUOUS QUERY cq1")
    assert(cat.statement("SHOW CONTINUOUS QUERIES").count() == 0)
  }

  test("retention policies: autogen default, DEFAULT demotion, enforcement") {
    val cat = new graft.influxql.MeasurementCatalog(spark)
    cat.statement("CREATE DATABASE ciwsdb")
    // born with autogen (infinite, default) — the Grafana handshake answer
    val auto = cat.statement("SHOW RETENTION POLICIES ON ciwsdb").collect()
    assert(auto.map(r => (r.getString(0), r.getString(1), r.getBoolean(3))).toSeq
      == Seq(("autogen", "0s", true)))
    // a new DEFAULT policy demotes autogen
    cat.statement(
      "CREATE RETENTION POLICY two_days ON ciwsdb DURATION 2d REPLICATION 1 DEFAULT")
    val rows = cat.statement("SHOW RETENTION POLICIES ON ciwsdb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(3))).toSet
    assert(rows == Set(("autogen", "0s", false), ("two_days", "172800s", true)))
    // enforcement: the default policy's duration becomes a store DELETE
    val root = java.nio.file.Files.createTempDirectory("rp_enforce").toString
    val store = new graft.store.MeasurementStore(spark, root)
    store.append("m", Tables.load(spark, sf, "events")
      .select(col("event_type"), col("ts").as("time"), col("value")))
    val touched = cat.applyRetention(store, "ciwsdb", "m", "2024-01-05 00:00:00")
    assert(touched.nonEmpty)
    assert(store.read("m")
      .filter(col("time") < to_timestamp(lit("2024-01-03 00:00:00")))
      .count() == 0)
    assert(store.read("m").count() > 0)
    // infinite retention (autogen default) touches nothing
    cat.statement("DROP RETENTION POLICY two_days ON ciwsdb")
    assert(cat.statement("SHOW RETENTION POLICIES ON ciwsdb").count() == 1)
    intercept[IllegalArgumentException](
      cat.statement("DROP RETENTION POLICY nosuch ON ciwsdb"))
    // ALTER: only the named clauses change; DEFAULT promotes + demotes;
    // omitted clauses (REPLICATION here) carry over
    cat.statement(
      "CREATE RETENTION POLICY keep ON ciwsdb DURATION 1w REPLICATION 3")
    cat.statement("ALTER RETENTION POLICY keep ON ciwsdb DURATION 2w DEFAULT")
    val altered = cat.statement("SHOW RETENTION POLICIES ON ciwsdb").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getBoolean(3)))
      .toSet
    assert(altered == Set(("autogen", "0s", 1, false),
      ("keep", "1209600s", 3, true)))
    // REPLICATION-only alter leaves duration and the default flag alone
    cat.statement("ALTER RETENTION POLICY keep ON ciwsdb REPLICATION 2")
    assert(cat.statement("SHOW RETENTION POLICIES ON ciwsdb").collect()
      .map(r => (r.getString(0), r.getInt(2), r.getBoolean(3))).toSet
      == Set(("autogen", 1, false), ("keep", 2, true)))
    // altering an unknown policy fails loudly — ALTER never creates
    intercept[IllegalArgumentException](
      cat.statement("ALTER RETENTION POLICY nosuch ON ciwsdb DURATION 1d"))
  }

  test("FROM comma list unions series sets; unknown names fail loudly") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = Seq(
      "events" -> m,
      "events_clicks" -> m.filter(col("event_type") === "click"))
    val both = InfluxQL.runCatalog(spark, cat,
      """SELECT count(value) AS n FROM "events", "events_clicks" GROUP BY time(1d)""")
    assert(both.select("measurement").distinct().collect().map(_.getString(0))
      .toSet == Set("events", "events_clicks"))
    // without a catalog the list form is rejected, like FROM /regex/
    intercept[IllegalArgumentException](InfluxQL.run(spark, m,
      """SELECT count(value) AS n FROM "events", "events_clicks" GROUP BY time(1d)"""))
    intercept[IllegalArgumentException](InfluxQL.runCatalog(spark, cat,
      """SELECT count(value) AS n FROM "events", "nosuch" GROUP BY time(1d)"""))
  }

  test("SHOW TAG VALUES WITH KEY IN / =~ answer the Grafana variable forms") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = Seq("events" -> m)
    val in = InfluxQL.runMeta(spark, cat,
      """SHOW TAG VALUES FROM events WITH KEY IN ("event_type", "nosuchkey")""")
    // unknown keys are skipped (Influx returns nothing for them), known ones answer
    assert(in.select("key").distinct().collect().map(_.getString(0)).toSeq
      == Seq("event_type"))
    val re = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES FROM events WITH KEY =~ /type/")
    assert(re.select("key").distinct().collect().map(_.getString(0)).toSeq
      == Seq("event_type"))
    // a pattern matching no tag key fails loudly rather than returning junk
    intercept[IllegalArgumentException](InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES FROM events WITH KEY =~ /zzz/"))
    // the FROM-less (catalog-wide) form with an unknown key answers EMPTY,
    // as InfluxDB does — a mistyped Grafana variable gets an empty
    // dropdown, not an error
    val none = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES WITH KEY = nosuchkey")
    assert(none.isEmpty && none.columns.toSeq == Seq("key", "value"))
    // ...and so does the FROM-scoped exact-key form
    val none2 = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES FROM events WITH KEY = nosuchkey")
    assert(none2.isEmpty && none2.columns.toSeq == Seq("key", "value"))
    // Grafana caps variable queries: LIMIT applies after the value sort
    val lim = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES FROM events WITH KEY = event_type LIMIT 2")
    val all = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES FROM events WITH KEY = event_type")
      .collect().map(_.getString(1)).toSeq
    assert(lim.collect().map(_.getString(1)).toSeq == all.take(2))
    // chained variables: WHERE narrows, LIMIT still caps
    val chained = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES FROM events WITH KEY = props " +
        "WHERE event_type =~ /click|view/ AND event_type != 'view' LIMIT 3")
    assert(chained.count() <= 3)
  }

  test("SHOW TAG KEY / FIELD KEY / TAG VALUES CARDINALITY answer the 1.x family") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = Seq(
      "events" -> m,
      "events_clicks" -> m.filter(col("event_type") === "click"))
    // tag/field key cardinality is schema-only: events carries 2 string
    // tags (event_type, props) and 3 numeric fields (event_id, user_id,
    // value); `time` is neither
    val tk = InfluxQL.runMeta(spark, cat, "SHOW TAG KEY CARDINALITY")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(tk == Seq(("events", 2L), ("events_clicks", 2L)))
    val fk = InfluxQL.runMeta(spark, cat, "SHOW FIELD KEY EXACT CARDINALITY")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fk == Seq(("events", 3L), ("events_clicks", 3L)))
    // FROM form: a single count for the named measurement
    val tkm = InfluxQL.runMeta(spark, cat,
      "SHOW TAG KEY CARDINALITY FROM events").collect()
    assert(tkm.map(_.getLong(0)).toSeq == Seq(2L))
    // tag-values cardinality = distinct values of ONE key; events_clicks
    // is a single-value slice by construction
    val tv = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES EXACT CARDINALITY WITH KEY = event_type")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val nTypes = m.select("event_type").distinct().count()
    assert(tv == Map("events" -> nTypes, "events_clicks" -> 1L))
    // unknown key: measurements without it are skipped → EMPTY, not error
    val none = InfluxQL.runMeta(spark, cat,
      "SHOW TAG VALUES CARDINALITY WITH KEY = nosuchkey")
    assert(none.isEmpty && none.columns.toSeq == Seq("measurement", "count"))
  }

  test("EXPLAIN reports expression, shards, series and points pre-execution") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = Seq("events" -> m)
    val rep = InfluxQL.runMeta(spark, cat,
      "EXPLAIN SELECT mean(value) AS mv FROM events " +
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-04 00:00:00' " +
        "GROUP BY time(1d), event_type")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep("EXPRESSION") == "mean(value) AS mv")
    val f = m.filter(col("time") >= "2024-01-02 00:00:00" &&
      col("time") < "2024-01-04 00:00:00")
    assert(rep("NUMBER OF POINTS").toLong == f.count())
    assert(rep("NUMBER OF SHARDS").toLong == 2L) // two whole days in range
    assert(rep("NUMBER OF SERIES").toLong ==
      f.select("event_type", "props").distinct().count())
    // EXPLAIN ANALYZE re-executes and reports timings — nondeterministic,
    // rejected loudly rather than approximated
    intercept[IllegalArgumentException](InfluxQL.runMeta(spark, cat,
      "EXPLAIN ANALYZE SELECT mean(value) FROM events"))
    // a subquery FROM has no stored frame to estimate — loud, not the
    // wrong source's numbers
    intercept[IllegalArgumentException](InfluxQL.runMeta(spark, cat,
      "EXPLAIN SELECT mean(mv) FROM (SELECT mean(value) AS mv FROM events " +
        "GROUP BY time(1h))"))
  }

  test("EXPLAIN over FROM /regex/ and FROM list: one SOURCE-led block per " +
    "resolved measurement; unknown list names and no-match regex are loud") {
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val cat = Seq("events" -> m,
      "events_clicks" -> m.filter(col("event_type") === "click"))
    def blocks(rows: Array[(String, String)]): Map[String, Map[String, String]] = {
      // split the (item, value) stream at SOURCE rows
      val idx = rows.zipWithIndex.collect { case (("SOURCE", _), i) => i }
      idx.zip(idx.drop(1) :+ rows.length).map { case (s, e) =>
        rows(s)._2 -> rows.slice(s + 1, e).toMap }.toMap
    }
    // the whole multi-source report runs as ONE distributed aggregate
    // over a union with a source column — the job count must stay a small
    // constant, not scale with the number of resolved measurements (it
    // used to be one sequential .head() job per source)
    spark.sparkContext.setJobGroup("explain_multi_gate", "gate")
    val re = try InfluxQL.runMeta(spark, cat,
      "EXPLAIN SELECT mean(value) FROM /events/ " +
        "WHERE time >= '2024-01-02 00:00:00' AND time < '2024-01-04 00:00:00'")
      .collect().map(r => r.getString(0) -> r.getString(1))
    finally spark.sparkContext.clearJobGroup()
    // status updates flow through an async bus; settle before reading
    Thread.sleep(1000)
    val nJobs = spark.sparkContext.statusTracker
      .getJobIdsForGroup("explain_multi_gate").length
    assert(nJobs <= 3, s"multi-source EXPLAIN ran $nJobs jobs - " +
      "the report must be one aggregate, not one job per source")
    val b = blocks(re)
    assert(b.keySet == Set("events", "events_clicks"))
    val f = m.filter(col("time") >= "2024-01-02 00:00:00" &&
      col("time") < "2024-01-04 00:00:00")
    assert(b("events")("NUMBER OF POINTS").toLong == f.count())
    assert(b("events_clicks")("NUMBER OF POINTS").toLong ==
      f.filter(col("event_type") === "click").count())
    assert(b("events")("EXPRESSION") == "mean(value)")
    // quoted FROM list: execution parity — a duplicated entry gets its
    // own block (the query unions each entry's scan, so the report must
    // count the work twice; the aggregate still runs once per distinct
    // name), and an unknown name fails loudly with EXACTLY the error the
    // query itself would hit, so EXPLAIN never estimates an unrunnable
    // query
    val li = InfluxQL.runMeta(spark, cat,
      """EXPLAIN SELECT count(value) FROM "events_clicks", "events_clicks"""")
      .collect().map(r => r.getString(0) -> r.getString(1))
    assert(li.length == 10 && li.count(_ == ("SOURCE", "events_clicks")) == 2)
    val lb = blocks(li)
    assert(lb.keySet == Set("events_clicks"))
    assert(lb("events_clicks")("NUMBER OF POINTS").toLong ==
      m.filter(col("event_type") === "click").count())
    intercept[IllegalArgumentException](InfluxQL.runMeta(spark, cat,
      """EXPLAIN SELECT count(value) FROM "events_clicks", "nope""""))
    // a single NAMED measurement keeps the headerless four-row shape
    val one = InfluxQL.runMeta(spark, cat,
      "EXPLAIN SELECT mean(value) FROM events").collect()
    assert(one.length == 4 && !one.exists(_.getString(0) == "SOURCE"))
    // zero regex matches: loud, as with an unknown named measurement
    intercept[IllegalArgumentException](InfluxQL.runMeta(spark, cat,
      "EXPLAIN SELECT mean(value) FROM /zzz/"))
  }
}
