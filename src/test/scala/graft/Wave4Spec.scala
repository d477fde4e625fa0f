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
      org.apache.spark.sql.Encoders.LONG)
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

  test("jsonl corpus: good rows round-trip byte-exactly, corrupt lines all " +
    "quarantined with exact content") {
    val docs = Tables.load(spark, sf, "documents")
    val good = ops.Ingest.scanJsonlCorpus(spark, sf)
    assert(good.count() == docs.count())
    // the JSON escape round-trip is lossless: md5 of the parsed text equals
    // md5 of the source text per doc
    val want = docs.select(col("doc_id"), md5(col("text")).as("m"))
      .as[(Long, String)].collect().toMap
    val got = good.select(col("doc_id"), col("text_md5"))
      .as[(Long, String)].collect().toMap
    assert(got == want)
    val q = ops.Ingest.sinkJsonlQuarantine(spark, sf)
      .as[String].collect().sorted.toSeq
    val trunc = docs.filter(col("doc_id") % 97 === 0)
      .select(concat(lit("{\"doc_id\": "), col("doc_id"),
        lit(", \"text\": \"trunc")))
      .as[String].collect().toSeq
    // the mixed-schema family: VALID JSON with doc_id as a string token —
    // the schema-first BIGINT read quarantines, never coerces
    val mixed = docs.filter(col("doc_id") % 131 === 5)
      .select(concat(lit("{\"doc_id\": \""), col("doc_id"),
        lit("\", \"text\": \"mixed schema\", \"n_chars\": 1}")))
      .as[String].collect().toSeq
    assert(q == (trunc ++ mixed).sorted && trunc.nonEmpty && mixed.nonEmpty)
  }

  test("jsonl quarantine: malformed UTF-8 bytes land in the dead letter, " +
    "never silently dropped or coerced") {
    import java.nio.file.{Files, Paths}
    val landing = Files.createTempDirectory("jsonl_utf8").toString
    // two good lines + one line whose text value contains raw invalid
    // UTF-8 (0xC3 0x28: a truncated two-byte sequence — the mid-write
    // crash artifact at the ENCODING level, below JSON syntax)
    val goodA = "{\"doc_id\": 1, \"text\": \"alpha\", \"lang\": \"en\", " +
      "\"source\": \"s\", \"n_chars\": 5}"
    val goodB = "{\"doc_id\": 2, \"text\": \"beta\", \"lang\": \"en\", " +
      "\"source\": \"s\", \"n_chars\": 4}"
    val badPrefix = "{\"doc_id\": 3, \"text\": \"".getBytes("UTF-8")
    val badBytes = Array[Byte](0xC3.toByte, 0x28.toByte)
    val badSuffix = "\", \"lang\": \"en\"}".getBytes("UTF-8")
    val all = (goodA + "\n" + goodB + "\n").getBytes("UTF-8") ++
      badPrefix ++ badBytes ++ badSuffix
    Files.write(Paths.get(s"$landing/part-0.txt"), all)
    val schema = "doc_id BIGINT, text STRING, lang STRING, source STRING, " +
      "n_chars BIGINT, _bad STRING"
    val parsed = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .json(landing).cache()
    try {
      val goodRows = parsed.filter(col("_bad").isNull)
      val badRows = parsed.filter(col("_bad").isNotNull)
      // conservation: every input line is exactly one of good/quarantined
      assert(parsed.count() == 3)
      assert(goodRows.count() == 2)
      assert(goodRows.select("doc_id").as[Long].collect().sorted
        .sameElements(Array(1L, 2L)))
      assert(badRows.count() == 1)
      // the dead letter holds the doc_id 3 artifact, its good prefix
      // intact — triageable, not a silent drop
      val raw = badRows.select("_bad").as[String].head()
      assert(raw.startsWith("{\"doc_id\": 3"))
    } finally { parsed.unpersist(); () }
  }

  test("gap report: telescoping law — mean gap equals (last-first)/(n-1)") {
    val rep = ops.Analytics.tsGapReport(spark, sf)
      .select(col("event_type"), col("user_id"), col("n_points"),
        col("n_gaps"), col("mean_gap_us"))
      .as[(String, Long, Long, Long, Double)].collect()
    val spans = Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(rep.length > 50, "series grain must be (event_type, user_id)")
    for ((et, uid, n, gaps, mean) <- rep) {
      val (_, _, lo, hi, cnt) = spans((et, uid))
      assert(n == cnt && gaps == n - 1, (et, uid))
      // consecutive gaps telescope: Σgap = hi - lo exactly, so the mean is
      // the same single IEEE division both ways
      assert(mean == (hi - lo).toDouble / (n - 1), (et, uid))
    }
  }

  test("stream gap report: equals the batch report; split-invariant; " +
    "late points counted, not silent") {
    def rep(df: org.apache.spark.sql.DataFrame)
        : Set[(String, Long, Long, Long, Option[Long], Option[Double], Long)] =
      df.as[(String, Long, Long, Long, Option[Long], Option[Double], Long)]
        .collect().toSet
    // drain equality on the fixture (single file → one micro-batch)
    assert(rep(streaming.StreamingOps.streamGapReport(spark, sf)) ==
      rep(ops.Analytics.tsGapReport(spark, sf)))
    assert(streaming.StreamingOps.gapReportLateDrops == 0L)
    // cross-batch gap formation: one series over two time-ordered files —
    // the boundary gap must form exactly once, and the split must be
    // invisible in the report
    import java.nio.file.{Files, Paths, StandardCopyOption}
    def rows(r: Range) = r.map { i =>
      ((i + 1).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:$i%02d:00"),
        1L, "s", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def writeSingle(df: org.apache.spark.sql.DataFrame, dest: String,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("gap_file").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(dest),
        StandardCopyOption.REPLACE_EXISTING)
      assert(new java.io.File(dest).setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    val split = Files.createTempDirectory("gap_split").toString
    writeSingle(rows(0 until 4), s"$split/events_1.parquet", t0)
    writeSingle(rows(4 until 10), s"$split/events_2.parquet", t0 + 10000)
    val whole = Files.createTempDirectory("gap_whole").toString
    writeSingle(rows(0 until 10), s"$whole/events_1.parquet", t0)
    assert(rep(streaming.StreamingOps.streamGapReport(spark, split)) ==
      rep(streaming.StreamingOps.streamGapReport(spark, whole)))
    // a file landing wholly behind the frontier: counted, result unchanged
    val late = Files.createTempDirectory("gap_late").toString
    writeSingle(rows(4 until 10), s"$late/events_1.parquet", t0)
    writeSingle(rows(0 until 4), s"$late/events_2.parquet", t0 + 10000)
    val head = Files.createTempDirectory("gap_head").toString
    writeSingle(rows(4 until 10), s"$head/events_1.parquet", t0)
    val lateRep = rep(streaming.StreamingOps.streamGapReport(spark, late))
    assert(streaming.StreamingOps.gapReportLateDrops == 4L,
      s"late drops: ${streaming.StreamingOps.gapReportLateDrops}")
    assert(lateRep == rep(streaming.StreamingOps.streamGapReport(spark, head)))
    // a 1-point series: the first-sight sentinel grain makes the stream
    // emit it exactly as the batch op does (n_points=1, n_gaps=0, null
    // max/mean) — before the sentinel the series was silently absent
    val solo = Files.createTempDirectory("gap_solo").toString
    val soloDf = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "a", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "a", 1.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:00:30"), 2L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writeSingle(soloDf, s"$solo/events.parquet", t0)
    val sr = rep(streaming.StreamingOps.streamGapReport(spark, solo))
    assert(sr == rep(ops.Analytics.tsGapReport(spark, solo)))
    assert(sr.exists(r => r._2 == 2L && r._3 == 1L && r._4 == 0L
      && r._5.isEmpty && r._6.isEmpty))
  }

  test("stream forecast eval: equals the batch report, even split mid-hour") {
    def rep(df: org.apache.spark.sql.DataFrame)
        : Set[(String, Long, Double, Double)] =
      df.as[(String, Long, Double, Double)].collect().toSet
    assert(rep(streaming.StreamingOps.streamForecastEval(spark, sf)) ==
      rep(ops.Analytics.tsForecastEval(spark, sf)))
    // a micro-batch boundary INSIDE an hour: the additive (Σ, n) grain
    // must merge to the same hourly mean the batch scan computes
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val rows = (0 until 96).map { i =>
      ((i + 1).toLong,
        java.sql.Timestamp.valueOf(
          f"2024-03-${1 + i / 48}%02d ${(i / 2) % 24}%02d:${30 * (i % 2)}%02d:00"),
        1L, "pulse", 5.0 + (i % 5) * 1.7, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    def writeSingle(df: org.apache.spark.sql.DataFrame, dest: String,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("fc_file").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(dest),
        StandardCopyOption.REPLACE_EXISTING)
      assert(new java.io.File(dest).setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    val split = Files.createTempDirectory("fc_split").toString
    // 61 is mid-hour (xx:30 of an hour whose xx:00 landed in file 1)
    writeSingle(rows.filter(col("event_id") <= 61),
      s"$split/events_1.parquet", t0)
    writeSingle(rows.filter(col("event_id") > 61),
      s"$split/events_2.parquet", t0 + 10000)
    val whole = Files.createTempDirectory("fc_whole").toString
    writeSingle(rows, s"$whole/events.parquet", t0)
    assert(rep(streaming.StreamingOps.streamForecastEval(spark, split)) ==
      rep(ops.Analytics.tsForecastEval(spark, whole)))
  }

  test("stream gopher rules + soft dedup equal their batch twins; " +
    "file-split invariant with dup groups straddling the split") {
    // drain equality on the fixture (single file → one micro-batch)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    assert(rows(streaming.StreamingOps.streamGopherRules(spark, sf)) ==
      rows(ops.Pipeline.pipelineGopherRules(spark, sf)))
    assert(rows(streaming.StreamingOps.streamSoftDedup(spark, sf)) ==
      rows(ops.Pipeline.pipelineSoftDedup(spark, sf)))
    // split-invariance under REAL cross-batch state: a synthetic corpus
    // whose exact-dup groups straddle the two files (the fixture plants
    // no dups at this sf), drained one file per micro-batch — the group
    // counts must MERGE across batches to the whole-corpus answer
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val longText = ("the be to of and that have with " * 10).trim
    def doc(id: Long, text: String) =
      (id, text, "en", "synthetic", text.length.toLong)
    val a = (1L to 6L).map(i => doc(i, longText + " alpha"))
    val b = (7L to 10L).map(i => doc(i, longText + " beta " + i))
    val all = (a ++ b)
    def mkDf(rs: Seq[(Long, String, String, String, Long)]) =
      rs.toDF("doc_id", "text", "lang", "source", "n_chars")
    def writeSingle(df: org.apache.spark.sql.DataFrame, dest: String,
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("curate_file").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(dest),
        StandardCopyOption.REPLACE_EXISTING)
      assert(new java.io.File(dest).setLastModified(mtime))
    }
    val t0 = System.currentTimeMillis() - 60000
    val split = Files.createTempDirectory("curate_split").toString
    // the alpha dup-group spans BOTH files: 4 members in file 1, 2 in
    // file 2 — a drain that fails to merge across batches would report
    // group_size 4 and 2 instead of 6
    writeSingle(mkDf(a.take(4) ++ b.take(2)),
      s"$split/documents_1.parquet", t0)
    writeSingle(mkDf(a.drop(4) ++ b.drop(2)),
      s"$split/documents_2.parquet", t0 + 10000)
    val whole = Files.createTempDirectory("curate_whole").toString
    writeSingle(mkDf(all), s"$whole/documents_1.parquet", t0)
    val splitSd = rows(streaming.StreamingOps.streamSoftDedup(
      spark, split, Some(1)))
    assert(splitSd == rows(streaming.StreamingOps.streamSoftDedup(
      spark, whole, None)))
    // the straddling group really merged: all 6 alpha docs weight 1/6
    val byId = streaming.StreamingOps.streamSoftDedup(spark, split, Some(1))
      .select("doc_id", "group_size").as[(Long, Long)].collect().toMap
    (1L to 6L).foreach(i => assert(byId(i) == 6L,
      s"doc $i group_size ${byId(i)} — cross-batch merge failed"))
    (7L to 10L).foreach(i => assert(byId(i) == 1L))
    // gopher is stateless — any split is trivially invariant, proven anyway
    assert(rows(streaming.StreamingOps.streamGopherRules(
        spark, split, Some(1))) ==
      rows(streaming.StreamingOps.streamGopherRules(spark, whole, None)))
  }

  test("dedup recall report: counts bounded, rates in [0,1], truth non-vacuous") {
    val rows = ops.Dedup.dedupRecallReport(spark, sf)
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(rows.map(_._1).sorted.toSeq ==
      Seq("embcos_lsh", "minhash_lsh", "ngram_capped", "semantic_kmeans"))
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
