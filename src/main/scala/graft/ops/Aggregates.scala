package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation parity surface (SURVEY.md §2.4): hash group-by with partial
  * (map-side) aggregation, distinct / approx-distinct, rollup / cube /
  * grouping sets, percentiles. All Catalyst built-ins — partial aggregation
  * means the shuffle carries one row per (task, group), not per input row,
  * which is what keeps these viable at 100 TB.
  */
object Aggregates {
  import Relational.{totalOrder, orderAll}

  /** Canonical hash group-by: count/sum/avg/min/max in one pass. */
  def aggHashGroupby(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("sum_price"),
        davg(col("o_totalprice")).as("avg_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        min(col("o_orderdate")).as("first_date"),
        max(col("o_orderdate")).as("last_date")))

  /** Exact distinct counting (expand + two-phase agg under the hood). */
  def aggDistinct(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows")))

  /** HLL++ relative standard deviation requested by the op, and the gate's
    * error budget: 3σ — the sketch's published ±rsd is one standard
    * deviation, so a 3·rsd envelope is the "practically always" bound the
    * differential gate pins (the fixture data is fixed, so the check is
    * deterministic: it either holds at every run or the sketch regressed). */
  private[graft] val HllRsd = 0.04

  /** HyperLogLog++ approximate distinct, RAW frame — the 100 TB answer to
    * countDistinct (constant memory, one pass, mergeable partials). The
    * sketch estimate is engine-specific, so this frame itself can't
    * hash-compare; [[aggApproxDistinct]] wraps it in the differential
    * error-bound gate, and the ScalaTest spec asserts the raw error too. */
  def aggApproxDistinctRaw(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), HllRsd).as("approx_parts"),
        count(lit(1)).as("n_rows")))

  /** The GATED face of [[aggApproxDistinctRaw]] (round-11 verdict #4 —
    * graduate the sketch from rows-only to a bounded-error status):
    * hash-compare is the wrong check for an engine-private sketch, but the
    * ERROR BOUND is checkable differentially — the frame computes BOTH the
    * HLL estimate and the exact distinct in one aggregate and emits the
    * exact count plus the |approx − exact| ≤ 3·rsd·exact verdict; DuckDB
    * recomputes the exact side and pins the verdict literally TRUE, so a
    * sketch drifting outside its published envelope is a hash-red gate
    * failure, not an invisible regression. (Computing the exact count
    * alongside is the CHECK's cost, not the op's — production calls the
    * raw frame.) */
  def aggApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), HllRsd).as("approx"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
        (abs(col("approx") - col("exact_parts")).cast("double")
          <= lit(3 * HllRsd) * col("exact_parts").cast("double"))
          .as("hll_in_bound")))

  /** Hierarchical subtotals: (status, priority) → (status) → grand total. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("sum_price")))

  /** All grouping combinations over two low-cardinality dims. */
  def aggCube(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .withColumn("user_bucket", col("user_id") % 4)
      .cube(col("event_type"), col("user_bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))

  /** Explicit GROUPING SETS via SQL (Catalyst Expand). */
  def aggGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "orders").createOrReplaceTempView("orders_gs")
    totalOrder(spark.sql(
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         |FROM orders_gs
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |""".stripMargin))
  }

  /** approx_percentile sketch accuracy: rank error ≤ n/accuracy (the
    * published 1/accuracy relative-rank guarantee of the mergeable
    * Greenwald-Khanna sketch). */
  private[graft] val GkAccuracy = 1000

  /** Approximate percentiles via the mergeable Greenwald-Khanna sketch,
    * RAW frame — the 100 TB sibling of [[aggPercentile]] (constant memory
    * per group, one pass, partials merge across partitions; InfluxQL
    * downsampling leans on percentiles constantly). Sketch internals are
    * engine-specific, so this frame can't hash-compare;
    * [[aggApproxPercentile]] wraps it in the rank-bound gate. */
  def aggApproxPercentileRaw(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5, $GkAccuracy)").as("ap50"),
        expr(s"approx_percentile(l_extendedprice, 0.9, $GkAccuracy)")
          .as("ap90_price"),
        count(lit(1)).as("n_rows")))

  /** The GATED face of [[aggApproxPercentileRaw]] (round-11 verdict #4):
    * GK's guarantee lives in RANK space — the returned value's rank is
    * within n/accuracy of p·n — so that is what the gate checks, not a
    * value tolerance. The frame joins the per-group estimates back to the
    * table (a ≤|groups|-row broadcast), counts rows strictly-below and
    * at-or-below each estimate (the estimate's feasible rank interval
    * [lt+1, le]), and emits whether that interval intersects
    * [p·n − n/acc, p·n + n/acc]; DuckDB recomputes n and pins the verdict
    * TRUE. A sketch whose compaction breaks its published bound goes
    * hash-red instead of silently rows-only-green. */
  def aggApproxPercentile(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val est = li.groupBy(col("l_returnflag"))
      .agg(
        expr(s"approx_percentile(l_quantity, 0.5, $GkAccuracy)").as("v50"),
        expr(s"approx_percentile(l_extendedprice, 0.9, $GkAccuracy)")
          .as("v90"))
    def inBound(le: Column, lt: Column, n: Column, p: Double): Column = {
      val target = lit(p) * n.cast("double")
      val slack = n.cast("double") / lit(GkAccuracy.toDouble)
      le.cast("double") >= target - slack &&
        (lt.cast("double") + 1.0) <= target + slack
    }
    totalOrder(li.join(broadcast(est), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity") <= col("v50"), 1L).otherwise(0L)).as("le50"),
        sum(when(col("l_quantity") < col("v50"), 1L).otherwise(0L)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("v90"), 1L).otherwise(0L))
          .as("le90"),
        sum(when(col("l_extendedprice") < col("v90"), 1L).otherwise(0L))
          .as("lt90"))
      .select(col("l_returnflag"), col("n_rows"),
        inBound(col("le50"), col("lt50"), col("n_rows"), 0.5)
          .as("ap50_in_bound"),
        inBound(col("le90"), col("lt90"), col("n_rows"), 0.9)
          .as("ap90_in_bound")))
  }

  /** Exact percentiles (sort-based; both engines linearly interpolate over
    * the ordered set, so values are bit-comparable). At 100 TB the same
    * query would switch to [[aggApproxPercentile]]'s mergeable sketch. */
  def aggPercentile(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_extendedprice, 0.9)").as("p90_price")))

  // ----------------------------------------------------------------- wiring

  /** Salted two-phase aggregation (the skew-mitigation idiom the 100 TB
    * brief calls for): a hot group key (event_type has ~5 values over
    * millions of rows) is salted with event_id % 16, partially aggregated
    * per (key, salt) — spreading each hot key over 16 reducers — then
    * re-aggregated per key. Decimal accumulation is associative, so the
    * result is bit-identical to the direct group-by and shares its oracle
    * shape. AQE's skew handling covers joins; salting is the aggregation-
    * side tool when a single group exceeds one reducer. */
  def aggSaltedSkew(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val partial = load(spark, dir, "events")
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy(col("event_type"), col("salt"))
      .agg(sum(col("value").cast(DecimalType(38, 6))).as("s"),
        count(lit(1)).as("c"))
    totalOrder(partial
      .groupBy(col("event_type"))
      .agg(sum(col("s")).cast(DoubleType).as("sum_value"),
        sum(col("c")).as("n")))
  }

  /** Long→wide pivot: daily event counts, one column per event type — the
    * report shape every dashboard export needs. Values are passed
    * EXPLICITLY to `.pivot` (collected from a sorted distinct over the
    * low-cardinality tag — bounded driver metadata): without them Spark
    * must launch an extra job anyway and the column order would depend on
    * collection order. The plan is one partial+final hash aggregation with
    * the pivot expressions fused — identical shape to conditional
    * aggregation, which is exactly how the oracle states it. */
  def aggPivot(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val types = ev.select(col("event_type")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    totalOrder(ev
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .groupBy(col("day"))
      .pivot("event_type", types)
      .agg(count(lit(1))))
  }

  /** Sketch capacity for [[aggHeavyHitters]]: items with global count >
    * N/[[HhK]] are heavy hitters; the Misra–Gries candidate set is ≤ HhK
    * entries per merged sketch. 32 sits just under the fixture's
    * ~1/29-uniform token shares so the gated output is non-trivial;
    * eviction and the recall guarantee under vocab ≫ k are exercised on
    * a constructed corpus in the spec. */
  private[graft] val HhK = 32

  /** Heavy hitters over the corpus token stream — sketch-then-verify, the
    * deterministic two-pass every large-scale frequency query runs:
    * stage 1 folds the tokens through the [[graft.functions
    * .GraftFunctions.MisraGries]] Aggregator (partial-aggregated: each
    * map task reduces its slice to a ≤ k-entry sketch before ONE tiny
    * merge — no full frequency table is ever built or shuffled), whose
    * merge rule GUARANTEES every item with count > N/k survives as a
    * candidate; stage 2 exact-counts ONLY the ≤ k candidates via a
    * broadcast semi-join and keeps those with k·count > N (integer
    * compare, no division). The output is therefore the EXACT heavy-
    * hitter set with exact counts — deterministic under any partitioning,
    * which is what lets a sketch-based op carry a full DuckDB oracle. At
    * 100 TB the full groupBy this replaces would shuffle every distinct
    * token; here the shuffle is k rows of sketch plus the candidate
    * counts. */
  def aggHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val toks = load(spark, dir, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("t"))
      .transform(graft.OpCaches.cached)
      .select(explode(col("t")).as("token"))
    val sketch = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.MisraGries(HhK),
      org.apache.spark.sql.Encoders.STRING)
    val candidates = toks.agg(sketch(col("token")).as("s"))
      .select(explode(map_keys(col("s"))).as("token"))
    val total = toks.agg(count(lit(1)).as("n"))
    totalOrder(toks
      .join(broadcast(candidates), "token")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * HhK > col("n"))
      .select(col("token"), col("cnt"), col("n")))
  }

  /** Exact daily active users via the [[graft.functions.GraftFunctions
    * .BitmapDistinct]] mergeable bitmap — the third point on the
    * distinct-count design spectrum this surface ships: `agg_distinct`
    * (exact, shuffles every distinct value), `agg_approx_distinct` (HLL,
    * cheap but approximate), and THIS (exact AND pre-aggregable): each
    * map task collapses its slice to a paged bitset per day, partial
    * aggregation merges bitsets with OR — so the exchange carries
    * |days| × O(pages) rows instead of |days| × |users| expanded rows,
    * and re-aggregation over pre-computed daily bitmaps (the Druid/
    * ClickHouse rollup pattern) would stay exact where HLL merges
    * compound error. Deterministic under any partitioning (OR is
    * commutative/associative/idempotent), so the sketch-shaped op
    * carries a plain COUNT(DISTINCT) oracle. */
  def aggBitmapDistinct(spark: SparkSession, dir: String): DataFrame = {
    val bitmap = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.BitmapDistinct,
      org.apache.spark.sql.Encoders.LONG)
    totalOrder(load(spark, dir, "events")
      .groupBy(date_trunc("DAY", col("ts")).as("day"))
      .agg(bitmap(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events")))
  }

  /** KMV sketch width. 256 makes both estimator regimes live on the
    * fixtures: groups with < 256 distinct parts (sf0.001) answer exactly
    * from the sub-full sketch, groups with ≥ 256 (sf0.01+) exercise the
    * (k−1)·2^60/h₍k₎ estimate, whose relative error is ~1/√(k−2) ≈ 6%. */
  private[graft] val KmvK = 256

  /** Approximate distinct via the [[graft.functions.GraftFunctions
    * .KmvDistinct]] k-minimum-values sketch — the PROVABLE sketch point on
    * the distinct-count spectrum (`agg_distinct` exact / `agg_bitmap_
    * distinct` exact-mergeable / `agg_approx_distinct` HLL rows-only /
    * THIS approximate-yet-hash-oracled): hashes are the repo's
    * cross-engine 60-bit md5 word, the summary is the k smallest distinct
    * hashes — an order statistic DuckDB re-derives with one window — and
    * the estimate is (k−1)·2^60/h₍k₎ with one IEEE division, so the
    * APPROXIMATION ITSELF is differentially pinned, closing the gap HLL's
    * engine-private registers can't. Partial aggregation ships ≤ k longs
    * per (task, group); min-k merge is associative/commutative/idempotent,
    * so partitioning can't move the estimate. A sub-full sketch (group
    * cardinality < k) has seen every distinct hash and answers exactly
    * with a NULL kth-hash marker. */
  def aggKmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.md5Words
    val kmv = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.KmvDistinct(KmvK),
      org.apache.spark.sql.Encoders.scalaLong)
    totalOrder(load(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        element_at(md5Words(spark, col("l_partkey").cast("string")), 1).as("h"))
      .groupBy(col("l_returnflag"))
      .agg(kmv(col("h")).as("sk"), count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        get(col("sk"), lit(KmvK - 1)).as("kth_hash"),
        size(col("sk")).cast("long").as("n_sketch"),
        when(size(col("sk")) < KmvK, size(col("sk")).cast("double"))
          .otherwise(lit((KmvK - 1).toDouble) * lit(1152921504606846976.0)
            / get(col("sk"), lit(KmvK - 1)).cast("double")).as("est_distinct"),
        col("n_rows")))
  }

  /** Quantile estimation over a MERGEABLE deterministic sample — the
    * provable cousin of `agg_approx_percentile` the same way
    * [[aggKmvDistinct]] is HLL's: the GK sketch's compaction is engine-
    * private (rows-only under the gate), but a bottom-k-by-hash row
    * sample ([[graft.functions.GraftFunctions.KmvSample]]) is a pure
    * function of the data — rows ranked by the cross-engine md5 word of
    * their unique key, k smallest kept — so the sample, and the
    * rank-exact lower quantile selected from it (the repo's
    * ts_anomaly_mad convention: never interpolated), reproduce bit-for-
    * bit in DuckDB. Mergeable by min-k union (associative/commutative/
    * idempotent ⇒ partition-invariant), one pass, ≤ k (hash, value)
    * pairs per (task, group) on the wire — and unlike reservoir
    * sampling the result can't depend on arrival order. Sub-full groups
    * (< k rows) hold the whole group, so the quantile is exact there —
    * both regimes live across the fixture SFs. Sampling error is in
    * RANK space: ~1/√k of the group's CDF, the spec's bound. */
  def aggSampleQuantile(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.GraftFunctions.md5Words
    val samp = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.KmvSample(KmvK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]())
    def idx(n: org.apache.spark.sql.Column, p: Double) =
      (floor((n - 1) * lit(p)) + 1).cast("int")
    totalOrder(load(spark, dir, "events")
      .select(col("event_type"),
        element_at(md5Words(spark, col("event_id").cast("string")), 1).as("h"),
        col("value"))
      .groupBy(col("event_type"))
      .agg(samp(col("h"), col("value")).as("sv"), count(lit(1)).as("n_rows"))
      .withColumn("sorted", array_sort(col("sv")))
      .withColumn("sample_n", size(col("sv")).cast("long"))
      .select(col("event_type"), col("sample_n"),
        element_at(col("sorted"), idx(col("sample_n"), 0.5)).as("q50_est"),
        element_at(col("sorted"), idx(col("sample_n"), 0.9)).as("q90_est"),
        col("n_rows")))
  }

  /** Top-k rows per group above. 5 keeps the demo output small; the plan
    * shape is identical at any k ≪ group size. */
  private[graft] val TopK = 5

  /** Per-group top-k WITHOUT the window sort, via the [[graft.functions
    * .GraftFunctions.TopKRows]] bounded Aggregator — the per-key
    * generalization of TakeOrderedAndProject: the window-rank formulation
    * (`row_number() OVER (PARTITION BY type ORDER BY value DESC)`)
    * shuffles and sorts EVERY event to keep 5 per type, while this plan
    * partial-aggregates each map task's slice to ≤ k (value, id) pairs —
    * at 100 TB the exchange carries k·tasks rows per group instead of the
    * corpus. The (value DESC, event_id ASC) total order makes ties
    * deterministic under any partitioning, so the output IS the window
    * formulation's and carries its oracle. */
  def aggTopkPartial(spark: SparkSession, dir: String): DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.GraftFunctions.TopKRows(TopK),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Double, Long)]())
    totalOrder(load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(topk(col("value"), col("event_id")).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("i", "p")))
      .select(col("event_type"), (col("i") + 1).cast("long").as("rk"),
        col("p._1").as("value"), col("p._2").as("event_id")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "agg_kmv_distinct" -> aggKmvDistinct,
    "agg_sample_quantile" -> aggSampleQuantile,
    "agg_topk_partial" -> aggTopkPartial,
    "agg_bitmap_distinct" -> aggBitmapDistinct,
    "agg_heavy_hitters" -> aggHeavyHitters,
    "agg_pivot" -> aggPivot,
    "agg_salted_skew" -> aggSaltedSkew,
    "agg_hash_groupby" -> aggHashGroupby,
    "agg_distinct" -> aggDistinct,
    "agg_approx_distinct" -> aggApproxDistinct,
    "agg_rollup" -> aggRollup,
    "agg_cube" -> aggCube,
    "agg_grouping_sets" -> aggGroupingSets,
    "agg_percentile" -> aggPercentile,
    "agg_approx_percentile" -> aggApproxPercentile)

  /** DuckDB twin of the 60-bit md5 word (the Dedup.md5w idiom). */
  private def sqlMd5w(x: String): String =
    s"CAST(('0x' || substring(md5($x), 1, 15))::UBIGINT AS BIGINT)"

  val oracle: Map[String, String] = Map(
    // the sketch summary is an order statistic of deterministic hashes, so
    // DuckDB re-derives the k smallest per group with one window and the
    // estimate from the same (k-1)*2^60/h_k expression — the approximation
    // itself is hash-compared, not just bounded
    "agg_kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT l_returnflag,
         |    ${sqlMd5w("CAST(l_partkey AS VARCHAR)")} AS h
         |  FROM lineitem),
         |r AS (
         |  SELECT l_returnflag, h,
         |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
         |  FROM h),
         |s AS (
         |  SELECT l_returnflag,
         |    MAX(CASE WHEN rn = $KmvK THEN h END) AS kth_hash,
         |    CAST(LEAST(COUNT(*), $KmvK) AS BIGINT) AS n_sketch
         |  FROM r WHERE rn <= $KmvK GROUP BY l_returnflag),
         |n AS (SELECT l_returnflag, COUNT(*) AS n_rows
         |      FROM lineitem GROUP BY l_returnflag)
         |SELECT s.l_returnflag, s.kth_hash, s.n_sketch,
         |  CASE WHEN s.kth_hash IS NULL THEN CAST(s.n_sketch AS DOUBLE)
         |       ELSE ${(KmvK - 1).toDouble} * 1152921504606846976.0
         |            / CAST(s.kth_hash AS DOUBLE) END AS est_distinct,
         |  n.n_rows
         |FROM s JOIN n USING (l_returnflag)
         |${orderAll("l_returnflag", "kth_hash", "n_sketch", "est_distinct",
              "n_rows")}""".stripMargin,
    // the sample is a pure function of the data (bottom-k by md5 rank),
    // so DuckDB re-derives it — and the rank-exact quantiles on it —
    // verbatim: the estimator, not just its error bound, is gated
    "agg_sample_quantile" ->
      s"""WITH s AS (
         |  SELECT event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY ${sqlMd5w("CAST(event_id AS VARCHAR)")}) AS rn
         |  FROM events),
         |r AS (
         |  SELECT event_type, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS vr,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM s WHERE rn <= $KmvK),
         |nn AS (SELECT event_type, COUNT(*) AS n_rows
         |       FROM events GROUP BY event_type)
         |SELECT r.event_type,
         |  CAST(MAX(r.n) AS BIGINT) AS sample_n,
         |  MAX(CASE WHEN r.vr = 1 + floor((r.n - 1) * 0.5)
         |      THEN r.value END) AS q50_est,
         |  MAX(CASE WHEN r.vr = 1 + floor((r.n - 1) * 0.9)
         |      THEN r.value END) AS q90_est,
         |  MAX(nn.n_rows) AS n_rows
         |FROM r JOIN nn USING (event_type)
         |GROUP BY r.event_type
         |${orderAll("event_type", "sample_n", "q50_est", "q90_est",
              "n_rows")}""".stripMargin,
    // the bounded Aggregator's total order (value DESC, id ASC) IS the
    // window formulation, so the oracle is the window it replaces at scale
    "agg_topk_partial" ->
      s"""SELECT event_type, CAST(rn AS BIGINT) AS rk, value, event_id
         |FROM (
         |  SELECT event_type, value, event_id,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY value DESC, event_id) AS rn
         |  FROM events)
         |WHERE rn <= $TopK
         |${orderAll("event_type", "rk", "value", "event_id")}""".stripMargin,
    // the bitmap is exact by construction, so the oracle is the plain
    // COUNT(DISTINCT) it replaces at scale
    "agg_bitmap_distinct" ->
      s"""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
         |  COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
         |FROM events GROUP BY 1
         |${orderAll("day", "n_users", "n_events")}""".stripMargin,
    // the sketch is a candidate generator with guaranteed recall; the
    // exact-verify pass makes the OUTPUT the plain heavy-hitter set, so
    // the oracle needs no sketch at all
    "agg_heavy_hitters" ->
      s"""WITH toks AS (
         |  SELECT unnest(list_filter(regexp_split_to_array(lower(text),
         |    '[^a-z0-9'']+'), x -> x <> '')) AS token
         |  FROM documents),
         |c AS (SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token),
         |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM c)
         |SELECT token, CAST(cnt AS BIGINT) AS cnt, n
         |FROM c CROSS JOIN t WHERE cnt * $HhK > n
         |${orderAll("token", "cnt", "n")}""".stripMargin,
    "agg_pivot" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
         |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
         |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
         |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
         |FROM events GROUP BY 1
         |${orderAll("day", "click", "error", "purchase", "signup", "view")}""".stripMargin,
    "agg_salted_skew" ->
      s"""SELECT event_type, ${sqlDsum("value")} AS sum_value, COUNT(*) AS n
         |FROM events GROUP BY event_type
         |${orderAll("event_type", "sum_value", "n")}""".stripMargin,
    "agg_hash_groupby" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price,
         |  ${sqlDavg("o_totalprice")} AS avg_price,
         |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
         |  MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date
         |FROM orders GROUP BY o_orderpriority
         |${orderAll("o_orderpriority", "n", "sum_price")}""".stripMargin,
    "agg_distinct" ->
      s"""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
         |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag
         |${orderAll("l_returnflag", "n_parts", "n_supps", "n_rows")}""".stripMargin,
    // the differential ERROR-BOUND gates (round-11 verdict #4): the sketch
    // estimates are engine-private, but their published error envelopes
    // are not — Spark emits the exact answer plus the in-bound verdict,
    // DuckDB recomputes the exact side and pins the verdict literally
    // TRUE, so a sketch outside its envelope is a hash-red failure
    "agg_approx_distinct" ->
      s"""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
         |  COUNT(*) AS n_rows, TRUE AS hll_in_bound
         |FROM lineitem GROUP BY l_returnflag
         |${orderAll("l_returnflag", "exact_parts", "n_rows",
              "hll_in_bound")}""".stripMargin,
    "agg_approx_percentile" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_rows,
         |  TRUE AS ap50_in_bound, TRUE AS ap90_in_bound
         |FROM lineitem GROUP BY l_returnflag
         |${orderAll("l_returnflag", "n_rows", "ap50_in_bound",
              "ap90_in_bound")}""".stripMargin,
    "agg_rollup" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         |  ${sqlDsum("o_totalprice")} AS sum_price
         |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
         |${orderAll("o_orderstatus", "o_orderpriority", "n", "sum_price")}""".stripMargin,
    "agg_cube" ->
      s"""SELECT event_type, user_id % 4 AS user_bucket, COUNT(*) AS n,
         |  ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY CUBE (event_type, user_id % 4)
         |${orderAll("event_type", "user_bucket", "n", "sum_value")}""".stripMargin,
    "agg_grouping_sets" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         |FROM orders
         |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         |${orderAll("o_orderstatus", "o_orderpriority", "n")}""".stripMargin,
    "agg_percentile" ->
      s"""SELECT l_returnflag,
         |  quantile_cont(l_quantity, 0.25) AS p25,
         |  quantile_cont(l_quantity, 0.5) AS p50,
         |  quantile_cont(l_quantity, 0.75) AS p75,
         |  quantile_cont(l_extendedprice, 0.9) AS p90_price
         |FROM lineitem GROUP BY l_returnflag
         |${orderAll("l_returnflag", "p25", "p50", "p75", "p90_price")}""".stripMargin)
}
