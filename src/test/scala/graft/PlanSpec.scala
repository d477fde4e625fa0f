package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan quality gates (the 100 TB design checks of the builder
  * brief): column pruning reaches the parquet reader, predicates push to
  * the scan, small dims broadcast, aggregates run partial+final, top-k
  * plans as TakeOrderedAndProject, and custom expressions stay inside
  * WholeStageCodegen. A correctness-green query that fails these would
  * still melt at 1000 executors — so they gate like tests.
  */
class PlanSpec extends SparkTestBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Final adaptive plan — AQE only annotates codegen stages after
    * execution; `*(n)` prefixes mark WholeStageCodegen stage n. */
  private def finalPlanOf(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(ExplainMode.fromString("simple"))
  }

  private def hasCodegenStage(plan: String): Boolean = plan.contains("*(")

  test("project_prune: ReadSchema carries only the projected columns") {
    val plan = planOf(ops.Relational.projectPrune(spark, sf))
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(read.contains("l_orderkey") && read.contains("l_extendedprice"))
    assert(!read.contains("l_quantity") && !read.contains("l_shipdate"),
      s"unpruned scan: $read")
  }

  test("filter_tag_eq: tag predicate pushed to the parquet scan") {
    val plan = planOf(ops.Relational.filterTagEq(spark, sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("IsNotNull(event_type)") ||
      pushed.contains("EqualTo(event_type,click)"),
      s"no pushdown: $pushed")
  }

  test("join_broadcast: dim side broadcasts (no shuffle of the fact)") {
    val plan = planOf(ops.Joins.joinBroadcast(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q1_agg: partial+final hash aggregation inside codegen") {
    val df = ops.Relational.q1Agg(spark, sf)
    val plan = planOf(df)
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
    assert(hasCodegenStage(finalPlanOf(df)))
  }

  test("topk_latest: plans as TakeOrderedAndProject, not a global sort") {
    val plan = planOf(ops.Relational.topkLatest(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("custom vec_dot expression stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sf, "embeddings")
      .select(functions.GraftFunctions.vecDot(spark,
        col("embedding"), col("embedding")).as("d"))
      .filter(col("d") > 0)
    val plan = finalPlanOf(df)
    assert(plan.contains("vec_dot"))
    assert(hasCodegenStage(plan), plan.take(2000))
  }

  test("agg_kmv_distinct / agg_topk_partial: typed sketch Aggregators run " +
    "partial+final — the bounded summary, not the rows, crosses the wire") {
    for (op <- Seq(ops.Aggregates.aggKmvDistinct _,
        ops.Aggregates.aggTopkPartial _)) {
      val plan = planOf(op(spark, sf))
      // udaf buffers plan as ObjectHashAggregate; partial + final = >= 2
      val aggs = plan.linesIterator.count(_.contains("ObjectHashAggregate"))
      assert(aggs >= 2, s"expected partial+final ObjectHashAggregate: $aggs")
      assert(!plan.contains("Window"),
        "sketch formulation must not fall back to a window sort")
    }
  }

  test("join_bloom_prune: the membership test is broadcast semi-joins — " +
    "the probe side never shuffles for the filter") {
    val plan = planOf(ops.Joins.joinBloomPrune(spark, sf))
    val semis = plan.linesIterator.count(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftSemi"))
    assert(semis >= 3, s"expected 3 broadcast semi-joins, got $semis\n" +
      plan.take(2000))
  }

  test("store_zorder_layout: bucket assignment is pure arithmetic — no " +
    "window/ntile sort anywhere in the plan") {
    val plan = planOf(ops.Store.storeZorderLayout(spark, sf))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("sim_knn_filtered: the lang predicate pushes to the documents scan") {
    val plan = planOf(ops.Vectors.simKnnFiltered(spark, sf))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString
    assert(pushed.contains("EqualTo(lang,en)"), s"no pushdown: $pushed")
  }

  test("join_bucketed: co-located SMJ with no hash-partition exchange") {
    val df = ops.Joins.joinBucketed(spark, sf)
    // final adaptive plan only (cut AQE's echoed "Initial Plan" section)
    val plan = finalPlanOf(df).split("== Initial Plan ==").head
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    assert(plan.contains("Bucketed: true"), "scans must be bucketed")
    // bucketing pre-places both sides: the only exchanges allowed are the
    // aggregation/ordering ones ABOVE the join (printed before it), never
    // below it
    val joinIdx = plan.indexOf("SortMergeJoin")
    val belowJoin = plan.substring(joinIdx)
    assert(!belowJoin.contains("Exchange hashpartitioning"),
      s"join inputs were shuffled:\n${belowJoin.take(1500)}")
  }

  test("dedup_incremental: one-sided shuffle — the persisted index scans " +
    "its buckets, only the incoming shard exchanges on bkey") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    ops.Dedup.releaseBandIndexes()
    val n0 = ops.Dedup.bandIndexBuildCount
    val df = ops.Dedup.dedupIncremental(spark, sf)
    df.collect()
    // object-level walk through the AQE wrappers (the explain STRING
    // embeds nested cached-plan sections, so string asserts mis-scope);
    // cached interiors stop the walk at InMemoryTableScan naturally
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case s: QueryStageExec => s +: flatten(s.plan)
      case o => o +: o.children.flatMap(flatten)
    }
    val all = flatten(df.queryExecution.executedPlan)
    val smj = all.collectFirst {
      case j: SortMergeJoinExec
        if j.leftKeys.exists(_.toString.contains("bkey")) => j
    }.getOrElse(fail(s"no bkey SortMergeJoin in:\n" +
      all.map(_.nodeName).mkString(", ")))
    // index side (right): reads its buckets, nothing shuffled below it
    val right = flatten(smj.right)
    val idxScan = right.collectFirst { case f: FileSourceScanExec => f }
      .getOrElse(fail("no file scan on the index side"))
    assert(idxScan.bucketedScan, "index scan must read its buckets")
    assert(!right.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "index side must not shuffle")
    // shard side (left): exactly one exchange ON THE JOIN KEY feeds the
    // merge — the only thing the ingest pays per probe
    val leftTop = flatten(smj.left)
      .collectFirst { case e: ShuffleExchangeExec => e }
      .getOrElse(fail("shard side must exchange on bkey"))
    assert(leftTop.outputPartitioning.toString.contains("bkey"),
      leftTop.outputPartitioning.toString)
    assert(ops.Dedup.bandIndexBuildCount == n0 + 1)
    // the index is build-once per (session, dir): a second consumer reuses
    ops.Dedup.dedupIndexBuild(spark, sf).collect()
    assert(ops.Dedup.bandIndexBuildCount == n0 + 1, "index rebuilt")
  }

  test("ts_gap_report: ONE series-key exchange feeds both the lag window " +
    "and the aggregate; grain is (event_type, user_id)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = ops.Analytics.tsGapReport(spark, sf)
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
      case s: QueryStageExec => s +: flatten(s.plan)
      case o => o +: o.children.flatMap(flatten)
    }
    val exch = flatten(df.queryExecution.executedPlan)
      .collect { case e: ShuffleExchangeExec => e.outputPartitioning.toString }
    // one hash exchange on the series key (window + agg share it: the agg
    // keys equal the window partition keys, so no second shuffle) plus
    // the driver-contract total-order range exchange — nothing else
    val hashed = exch.filter(_.startsWith("hashpartitioning"))
    assert(hashed.size == 1, s"exchanges: $exch")
    assert(hashed.head.contains("event_type") && hashed.head.contains("user_id"),
      s"series key must be (event_type, user_id): ${hashed.head}")
    assert(exch.count(_.startsWith("rangepartitioning")) == 1,
      s"exchanges: $exch")
  }

  test("VecDotRewrite: declarative dot folds plan as fused vec_dot") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.DoubleType
    functions.GraftFunctions.register(spark)
    // pairwise fold (the sim_knn_bruteforce shape)
    val pair = Tables.load(spark, sf, "embeddings").as("a")
      .limit(10).crossJoin(
        Tables.load(spark, sf, "embeddings").limit(10)
          .select(col("embedding").as("e2")))
      .select(aggregate(
        zip_with(col("embedding"), col("e2"),
          (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
        lit(0.0), (acc, x) => acc + x).as("d"))
    assert(pair.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      pair.queryExecution.optimizedPlan.toString.take(1500))
    // self-dot fold (the fn_array / multimodal norm_sq shape)
    val self = Tables.load(spark, sf, "embeddings")
      .select(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType)).as("n2"))
    assert(self.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      self.queryExecution.optimizedPlan.toString.take(1500))
    // a fold with a DIFFERENT merge shape must be left alone
    val other = Tables.load(spark, sf, "embeddings")
      .select(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast(DoubleType)).as("s"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    // and the rewritten plan computes the identical values
    val viaRule = self.limit(50).collect().map(_.getDouble(0))
    val native = Tables.load(spark, sf, "embeddings")
      .select(functions.GraftFunctions.vecDot(spark,
        col("embedding"), col("embedding")).as("n2"))
      .limit(50).collect().map(_.getDouble(0))
    assert(viaRule.sameElements(native))
  }

  test("pipeline_decontaminate: eval grams broadcast, corpus side never shuffles") {
    val plan = planOf(ops.Pipeline.pipelineDecontaminate(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("influxql SLIMIT: series page comes back as a broadcast semi-join") {
    import org.apache.spark.sql.functions._
    val m = Tables.load(spark, sf, "events").withColumnRenamed("ts", "time")
    val df = influxql.InfluxQL.run(spark, m,
      "SELECT count(value) AS n FROM events GROUP BY time(1d), event_type " +
        "SLIMIT 2 SOFFSET 1")
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(2000))
    // and the page really is series 2..3 in tag order
    val kept = df.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val all = m.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    assert(kept == all.slice(1, 3), s"kept=$kept all=$all")
  }

  test("band_keys: fused LSH signature stays inside WholeStageCodegen") {
    import org.apache.spark.sql.functions._
    val df = Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        functions.GraftFunctions.bandKeys(spark, col("embedding")).as("bk"))
      .filter(size(col("bk")) > 0)
    val plan = finalPlanOf(df)
    assert(plan.contains("band_keys"))
    assert(hasCodegenStage(plan), plan.take(2000))
  }

  test("pipeline_curate: embeddings scan prunes to id + vector") {
    val plan = planOf(ops.Pipeline.pipelineCurate(spark, sf))
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    val embRead = reads.linesIterator.find(_.contains("embedding")).getOrElse("")
    assert(embRead.contains("vec_id"), s"missing embeddings read: $reads")
    assert(!embRead.contains("label"), s"unpruned embeddings scan: $embRead")
  }

  test("sim_knn_ivf: centroid assignment broadcasts, never shuffles corpus") {
    val plan = planOf(ops.Vectors.simKnnIvf(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(2000))
  }

  test("sim_knn_pq: ADC tables broadcast — the code scan never shuffles") {
    val plan = planOf(ops.Vectors.simKnnPq(spark, sf))
    // the |Q|·M·K distance table must replicate to the code-scan tasks;
    // shuffling n·M code rows to meet it would defeat the PQ design
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("sim_knn_ivfpq: ADC tables broadcast into the list-pruned code scan") {
    val plan = planOf(ops.Vectors.simKnnIvfPq(spark, sf))
    // same invariant as the PQ tier — the per-query distance tables
    // replicate to the scan tasks; the composed path must not regress to
    // shuffling code rows to meet them
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("lineproto parse: stateless projection + explode, no exchange") {
    import spark.implicits._
    val lines = Seq("m,t=a f=1.5 1704067200000000000").toDF("line")
    val plan = planOf(graft.ingest.LineProtocol.parseLines(lines))
    // a line parses entirely within its own row: any Exchange would mean
    // the parse itself shuffles, which must never happen at any scale
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("agg_hash_groupby: map-side partial aggregation before the shuffle") {
    val plan = planOf(ops.Aggregates.aggHashGroupby(spark, sf))
    // partial agg must appear below the exchange: find the line order
    val lines = plan.linesIterator.toSeq
    val partialIdx = lines.indexWhere(l =>
      l.contains("HashAggregate") || l.contains("Aggregate"))
    assert(partialIdx >= 0)
    assert(plan.contains("Exchange"), "expected a shuffle for the groupBy")
    val aggs = plan.linesIterator.count(_.contains("HashAggregate"))
    assert(aggs >= 2, s"no partial aggregation: $aggs HashAggregate nodes")
  }

  test("pipeline_pack_sequences: corpus running sum partitions by bucket") {
    val plan = planOf(ops.Pipeline.pipelinePackSequences(spark, sf))
    // the corpus-wide cumulative sum must run as a PARTITIONED window
    // (per doc_id-range bucket) — never one global single-partition sort
    assert(plan.contains("hashpartitioning(bucket"),
      s"running-sum window not bucket-partitioned:\n${plan.take(2000)}")
    // every window ordered by doc_id (the corpus-scale one) carries the
    // bucket partition key; the only unpartitioned window allowed is the
    // constant-size (≤ PackBuckets rows) offsets prefix over bucket_tokens
    val wins = plan.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    val corpusWins = wins.filter(_.contains("doc_id"))
    assert(corpusWins.nonEmpty &&
      corpusWins.forall(_.contains("bucket")),
      s"unpartitioned corpus window:\n${wins.mkString("\n")}")
    // at most one single-partition exchange (the tiny offsets side);
    // the corpus path must not contribute one
    val singles = plan.linesIterator.count(_.contains("SinglePartition"))
    assert(singles <= 1, s"$singles single-partition stages:\n${plan.take(2000)}")
  }

  test("pipeline_shuffle_order: rank window partitions by shard, no global sort") {
    val plan = planOf(ops.Pipeline.pipelineShuffleOrder(spark, sf))
    // the epoch-shuffle rank must never collapse to one partition — a
    // single-partition Window is the classic 100 TB melt; partitioning by
    // shard keeps every shard's sort parallel
    val windows = plan.linesIterator
      .filter(_.contains("Window")).mkString("\n")
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage in:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning(shard"),
      s"rank window not partitioned by shard:\n$windows")
  }

  test("text_lm_score / text_lm_bigram: model tables broadcast back onto " +
    "the postings — no sort-merge join of the corpus") {
    for (df <- Seq(ops.Text.textLmScore(spark, sf),
        ops.Text.textLmBigram(spark, sf))) {
      val plan = planOf(df)
      assert(plan.contains("BroadcastHashJoin") ||
        plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
      assert(!plan.contains("SortMergeJoin"),
        s"corpus-side shuffle join in:\n${plan.take(2000)}")
      OpCaches.releaseAll()
    }
  }

  test("dedup_containment: no cartesian product — candidates come from the " +
    "inverted-index equi-join, like the jaccard pass") {
    val plan = planOf(ops.Dedup.dedupContainment(spark, sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs shape in containment plan:\n${plan.take(2000)}")
    OpCaches.releaseAll()
  }

  test("text_lm_split: tercile window partitions by lang — per-language " +
    "sorts stay parallel") {
    val plan = planOf(ops.Text.textLmSplit(spark, sf))
    // the only SinglePartition allowed is lmScore's one-row corpus-stats
    // aggregate (bounded by definition); the tercile WINDOW must key by
    // lang so each language sorts in parallel
    assert(plan.contains("hashpartitioning(lang"),
      s"tercile window not partitioned by lang:\n${plan.take(2000)}")
    OpCaches.releaseAll()
  }

  test("ts_pattern_match: window frames partition by the series key; " +
    "scan prunes to the window's columns") {
    val plan = planOf(ops.TimeSeries.tsPatternMatch(spark, sf))
    assert(!plan.contains("SinglePartition"),
      s"global single-partition stage in:\n${plan.take(2000)}")
    assert(plan.contains("hashpartitioning(event_type"),
      s"sliding window not partitioned by series:\n${plan.take(2000)}")
    val read = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!read.contains("props") && !read.contains("user_id"),
      s"unpruned events scan: $read")
    OpCaches.releaseAll()
  }

  test("pipeline_corpus_stats: one partial+final aggregate keyed by " +
    "source — map-side combine before the shuffle") {
    val plan = planOf(ops.Pipeline.pipelineCorpusStats(spark, sf))
    assert(plan.contains("HashAggregate"), plan.take(1500))
    // partial aggregation exists: two HashAggregate nodes around one
    // source-keyed exchange
    assert(plan.contains("hashpartitioning(source"),
      s"aggregate not keyed by source:\n${plan.take(2000)}")
    OpCaches.releaseAll()
  }

  test("sim_knn_indexed: probed cells dynamic-partition-prune the on-disk " +
    "lists scan — the storage layer does the list pruning") {
    val plan = ops.Vectors.simKnnIndexed(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"lists scan not partition-pruned by the probe set:\n${plan.take(2000)}")
    OpCaches.releaseAll()
  }

  test("join_range_bucket: interval join plans as an EQUI join, never " +
    "a nested-loop theta join") {
    val plan = planOf(ops.Joins.joinRangeBucket(spark, sf))
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"theta-join shape survived the bucket rewrite:\n${plan.take(2000)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("text_bm25: one-row stats broadcast, documents scan prunes to " +
    "id + text, corpus never shuffle-joins") {
    val plan = planOf(ops.Text.textBm25(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    val reads = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!reads.contains("lang") && !reads.contains("n_chars"),
      s"unpruned documents scan: $reads")
  }

  test("sim_knn_rp: query set broadcasts against the projected corpus") {
    val plan = planOf(ops.Vectors.simKnnRp(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    // the exact re-rank joins the 32-wide candidate pool back — small
    // side must broadcast, the corpus must not sort-merge
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
    OpCaches.releaseAll()
  }

  test("quality scorer: fused byte-walk counters — no regex engine, no " +
    "token array, all three features in one codegen projection") {
    val df = ops.Pipeline.pipelineQualityClassifier(spark, sf)
    val plan = planOf(df)
    // the old shape paid regexp_extract_all (match-array materialization)
    // twice plus a split() token array per row, just to size() them
    assert(!plan.contains("regexp_extract_all"), plan.take(3000))
    assert(!plan.contains("split("), plan.take(3000))
    assert(plan.contains("token_count") && plan.contains("stop_count") &&
      plan.contains("punct_count"), plan.take(3000))
    // `*(n)` codegen markers only appear in the executed simple plan
    assert(hasCodegenStage(finalPlanOf(df)),
      "scorer fell out of WholeStageCodegen")
  }

  test("pipeline_dsir: the LLR term is evaluated on the broadcast bucket " +
    "model, not per posting row") {
    val plan = planOf(ops.Pipeline.pipelineDsir(spark, sf))
    // posting-grain side of the model join must carry no log() — the 4
    // libm logs + round + decimal cast live on the ≤8192-row broadcast
    // side (measured 12.0 → 9.4 s at sf1 when moved)
    val postingJoin = plan.linesIterator
      .dropWhile(!_.contains("BroadcastHashJoin")).take(40).mkString("\n")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!postingJoin.contains("LOG("), postingJoin)
    OpCaches.releaseAll()
  }
}
