package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Semantic + plan-shape gates for the curation wave: substring-grain
  * dedup (winnowing spans), the Gopher rule funnel, SoftDedup
  * reweighting, and DSIR importance resampling.
  */
class CurationSpec extends SparkTestBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("dedup_substring: localization guarantee — a shared >= w+k-1 token " +
    "run yields overlapping spans in BOTH docs; disjoint docs get none") {
    import spark.implicits._
    val run = "rose tulip daisy orchid lily fern moss ivy oak elm birch pine"
    val docs = Seq(
      (1L, s"aa bb cc dd ee $run ff gg hh", "en", "x", 1L),
      (2L, s"zz yy $run xx ww vv uu tt ss rr qq pp", "en", "y", 1L),
      (3L, "totally different words about nothing shared at all here okay then",
        "en", "z", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("substr").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val spans = ops.Dedup.dedupSubstring(spark, dir)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    // the 12-token run starts at token 6 in doc 1 and token 3 in doc 2;
    // the MOSS bound guarantees a shared selected print inside it, so each
    // doc's span set must intersect its copy of the run
    assert(spans(1L).exists(s => s._2 <= 17 && s._3 >= 6),
      s"doc 1 spans ${spans(1L).toSeq} miss the planted run [6,17]")
    assert(spans(2L).exists(s => s._2 <= 14 && s._3 >= 3),
      s"doc 2 spans ${spans(2L).toSeq} miss the planted run [3,14]")
    assert(!spans.contains(3L), "disjoint doc produced a span")
    OpCaches.releaseAll()
  }

  test("dedup_substring: spans are disjoint per doc, k-or-wider, inside " +
    "the doc, and identical across exact-duplicate documents") {
    import spark.implicits._
    val rows = ops.Dedup.dedupSubstring(spark, sf)
      .select("doc_id", "span_start", "span_end", "n_prints", "span_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty, "fixture produced no duplicated substrings")
    rows.foreach { case (_, s, e, np, st) =>
      assert(s >= 1 && e >= s + 2 && st == e - s + 1 && np >= 1)
    }
    rows.groupBy(_._1).foreach { case (d, sp) =>
      val sorted = sp.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 > a._3,
          s"doc $d spans overlap: $a then $b")
        case _ =>
      }
    }
    // exact-duplicate docs must carry identical span sets (constructed:
    // the small fixtures plant no exact dups)
    val body = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq(
      (10L, body, "en", "a", body.length.toLong),
      (11L, body, "en", "b", body.length.toLong),
      (12L, s"unrelated prefix words then $body and a different tail here",
        "en", "c", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("substr_dup").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val dup = ops.Dedup.dedupSubstring(spark, dir)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(dup(10L) == dup(11L), s"exact dups disagree: ${dup(10L)} vs ${dup(11L)}")
    assert(dup.contains(12L), "embedding doc got no span")
    OpCaches.releaseAll()
  }

  test("dedup_substring_rewrite: the cut reconciles with the span report " +
    "and clean docs pass through byte-identical") {
    import spark.implicits._
    val spans = ops.Dedup.dedupSubstring(spark, sf)
    val rewrite = ops.Dedup.dedupSubstringRewrite(spark, sf)
    val dropBySpan = spans.groupBy(col("doc_id"))
      .agg(sum(col("span_tokens")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = rewrite.collect()
    assert(rows.length == Tables.load(spark, sf, "documents").count())
    rows.foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("n_dropped") == dropBySpan.getOrElse(d, 0L),
        s"doc $d dropped ${r.getAs[Long]("n_dropped")} != span report")
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_dropped")
        == r.getAs[Long]("n_tokens"))
    }
    // a doc with no spans keeps its full token stream: clean_md5 equals
    // the md5 of the re-joined original tokens
    val noSpan = rows.filter(r => !dropBySpan.contains(r.getAs[Long]("doc_id")))
    if (noSpan.nonEmpty) {
      val ids = noSpan.map(_.getAs[Long]("doc_id")).toSet
      val orig = Tables.load(spark, sf, "documents")
        .filter(col("doc_id").isInCollection(ids))
        .select(col("doc_id"), md5(array_join(
          filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= ""),
          " ")).as("m"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      noSpan.foreach(r => assert(
        r.getAs[String]("clean_md5") == orig(r.getAs[Long]("doc_id"))))
    }
    OpCaches.releaseAll()
  }

  test("gopher rules: integer cross-multiplied gates equal the real-ratio " +
    "gates; the stopword gate honestly fails the word-soup corpus") {
    val df = ops.Pipeline.pipelineGopherRules(spark, sf)
    val rows = df.collect()
    assert(rows.length == Tables.load(spark, sf, "documents").count())
    rows.foreach { r =>
      val nWords = r.getAs[Long]("n_words")
      val wordChars = r.getAs[Long]("word_chars")
      val nAlpha = r.getAs[Long]("n_alpha")
      val mean = wordChars.toDouble / nWords
      assert(r.getAs[Boolean]("r_mean_word_len") == (mean >= 3.0 && mean <= 10.0))
      assert(r.getAs[Boolean]("r_alpha_words") == (nAlpha.toDouble / nWords >= 0.8))
      assert(r.getAs[Boolean]("r_word_count") == (nWords >= 50 && nWords <= 100000))
    }
    // the synthetic corpus carries only 'the' from the Gopher stopword
    // list - the gate fails corpus-wide (that is the filter WORKING), and
    // the conjunction with it
    assert(rows.forall(r => r.getAs[Long]("n_stop") <= 1))
    assert(rows.forall(r => !r.getAs[Boolean]("r_stopwords")))
    assert(rows.forall(r => !r.getAs[Boolean]("pass_gopher")))
    // while a discriminating rule still splits the corpus both ways
    val wc = rows.map(_.getAs[Boolean]("r_word_count")).toSet
    assert(wc == Set(true, false), s"r_word_count degenerate: $wc")
  }

  test("gopher rules: plan is one shuffle-free scan") {
    val plan = planOf(ops.Pipeline.pipelineGopherRules(spark, sf))
    // the totalOrder sort is the only exchange-like node allowed; no
    // hashpartitioning exchange may appear (per-row expressions only)
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("soft dedup: weights reconcile - same group same weight, sum(1/c) " +
    "per group = 1 within rounding, effective tokens <= raw tokens") {
    import spark.implicits._
    val rows = ops.Pipeline.pipelineSoftDedup(spark, sf).collect()
    val byGroup = rows.groupBy(r => (r.getAs[Long]("group_size"),
      r.getAs[Double]("weight")))
    byGroup.keys.foreach { case (c, w) =>
      assert(math.abs(w - 1.0 / c) < 5e-7, s"weight $w != 1/$c")
    }
    rows.foreach { r =>
      val eff = r.getAs[Double]("eff_tokens")
      val raw = r.getAs[Long]("n_tokens").toDouble
      assert(eff <= raw + 1e-9 && eff >= raw / r.getAs[Long]("group_size") - 1e-6)
    }
    // the corpus-level invariant: sum of weights = number of DISTINCT
    // contents (each group contributes c * (1/c) = 1)
    val sumW = rows.map(_.getAs[Double]("weight")).sum
    val distinctContents = Tables.load(spark, sf, "documents")
      .select(sha2(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 256))
      .distinct().count()
    assert(math.abs(sumW - distinctContents) < 1e-3,
      s"sum of weights $sumW != distinct contents $distinctContents")
    // duplicated groups on a constructed corpus (the small fixtures plant
    // no exact dups): two identical docs halve, the distinct doc keeps 1
    val body = "the quick brown fox jumps over the lazy dog again and again"
    val tmp = java.nio.file.Files.createTempDirectory("softdup").toString
    Seq((1L, body, "en", "a", body.length.toLong),
      (2L, body, "en", "a", body.length.toLong),
      (3L, "entirely different content here", "en", "a", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val d = ops.Pipeline.pipelineSoftDedup(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("group_size"), r.getAs[Double]("weight"))).toMap
    assert(d(1L) == ((2L, 0.5)) && d(2L) == ((2L, 0.5)) && d(3L) == ((1L, 1.0)))
  }

  test("dsir: the sample pulls toward the target - mean lambda of target-" +
    "language docs exceeds the rest, exactly DsirKeep docs are selected, " +
    "and gram counts reconcile with the tokenizer") {
    val dir = "/root/testdata/sf0.01"
    val df = ops.Pipeline.pipelineDsir(spark, dir)
    val rows = df.collect()
    assert(rows.count(_.getAs[Boolean]("selected")) == 100)
    val toks = filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= "")
    val langs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), size(toks).cast("long").as("n_tok"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val nTok: Long = langs(r.getAs[Long]("doc_id"))._2
      assert(r.getAs[Long]("n_grams") == 2L * nTok - 1L)
    }
    val (en, rest) = rows.partition(r => langs(r.getAs[Long]("doc_id"))._1 == "en")
    val meanEn = en.map(_.getAs[Double]("lambda")).sum / en.length
    val meanRest = rest.map(_.getAs[Double]("lambda")).sum / rest.length
    assert(meanEn > meanRest,
      s"importance weights don't favor the target: en $meanEn vs $meanRest")
    OpCaches.releaseAll()
  }

  test("chunk_text: geometry laws - full coverage, exact overlap, tail " +
    "clipped, whole-doc chunk hashes the whole token stream") {
    val rows = ops.Pipeline.pipelineChunkText(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id"),
        r.getAs[Long]("tok_start"), r.getAs[Long]("tok_end"),
        r.getAs[Long]("n_tok"), r.getAs[String]("chunk_md5")))
    assert(rows.nonEmpty)
    val nTok = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), size(
        filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= ""))
        .cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (d, ch) =>
      val n = nTok(d)
      val sorted = ch.sortBy(_._2)
      // stride geometry: chunk i starts at i*48+1; ends clipped to n;
      // the union of [start, end] covers 1..n with no hole
      sorted.foreach { case (_, i, s, e, nt, _) =>
        assert(s == i * 48 + 1 && e == math.min(s + 63, n) && nt == e - s + 1)
      }
      assert(sorted.head._3 == 1 && sorted.last._4 == n)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 <= a._4 + 1, s"hole in doc $d")
        case _ =>
      }
      // expected chunk count: 1 + ceil(max(n-64,0)/48)
      val expect = 1 + (math.max(n - 64, 0) + 47) / 48
      assert(sorted.length == expect, s"doc $d: ${sorted.length} != $expect")
    }
    // a short doc's single chunk hashes its whole token stream
    val whole = rows.filter(r => nTok(r._1) <= 64)
    assert(whole.nonEmpty)
    val md5all = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(array_join(
        filter(split(lower(col("text")), "[^a-z0-9']+"), t => t =!= ""),
        " ")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    whole.foreach(r => assert(r._6 == md5all(r._1)))
    OpCaches.releaseAll()
  }

  test("dsir: selection plans as TakeOrderedAndProject, never a global " +
    "single-partition window") {
    val plan = planOf(ops.Pipeline.pipelineDsir(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(3000))
    assert(!plan.contains("Window"), plan.take(3000))
    OpCaches.releaseAll()
  }

  test("sample temperature: q is a distribution that upsamples small " +
    "sources and downsamples dominant ones, keep rates capped at 1000") {
    val rows = ops.Pipeline.pipelineSampleTemperature(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Double]("share"),
        r.getAs[Double]("q"), r.getAs[Long]("keep_mille"),
        r.getAs[Double]("epochs")))
    assert(rows.length >= 2)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-6, "q must sum to 1")
    rows.foreach { case (_, share, q, km, ep) =>
      assert(km >= 0 && km <= 1000)
      assert(ep >= 0)
      // α = 0.3 < 1 (T ≈ 3.3 > 1) FLATTENING: below-average sources gain
      // share, above-average sources lose it (the defining property of
      // temperature-flattened source mixing)
      val avg = 1.0 / rows.length
      if (share < avg * 0.8) assert(q > share, s"tail source not upsampled")
      if (share > avg * 1.2) assert(q < share, s"head source not downsampled")
    }
    // flattening is monotone: source order by share == order by q
    val byShare = rows.sortBy(_._2).map(_._1).toSeq
    val byQ = rows.sortBy(_._3).map(_._1).toSeq
    assert(byShare == byQ)
  }

  test("substring family: no cartesian products or nested-loop joins; " +
    "chunker plans shuffle-free up to its output sort") {
    val p1 = planOf(ops.Dedup.dedupSubstring(spark, sf))
    val p2 = planOf(ops.Dedup.dedupSubstringRewrite(spark, sf))
    Seq(p1, p2).foreach { p =>
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    }
    val p3 = planOf(ops.Pipeline.pipelineChunkText(spark, sf))
    // one Generate (the explode) and zero hash-partition shuffles
    assert(p3.contains("Generate") &&
      !p3.contains("Exchange hashpartitioning"), p3.take(2000))
    OpCaches.releaseAll()
  }
}
