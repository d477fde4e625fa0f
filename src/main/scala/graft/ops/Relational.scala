package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational parity operators (SURVEY.md §2.1–§2.2, §2.4 reference instances,
  * §2.6): scans/projections/filters/sorts/limits/set-ops demonstrated on the
  * driver fixtures with DuckDB oracle twins.
  *
  * Reference behaviors re-expressed (citations are reference file:line):
  *  - column pruning at scan (`loader.py:132`) → `select` (Catalyst pushes
  *    the projection into the parquet reader — check ReadSchema in explain).
  *  - `Pulses→pulses` rename (`loader.py:134`) → `withColumnRenamed`.
  *  - constant/derived tag column (`transfer_manager.py:123,172`) →
  *    `withColumn(..., upper(...))`.
  *  - time-range + tag predicates pushed to the store
  *    (`get_hot_intake_interval.py:117`) → filters that reach PushedFilters.
  *  - nonzero pulse detection (`get_hot_intake_interval.py:124,141`).
  *  - deterministic file ordering / latest-by-mtime
  *    (`loader.py:32-34`, `datalogger_health_check.py:88-91`) → orderBy /
  *    TakeOrderedAndProject top-k.
  *  - 4-col/7-col schema union (`transfer_manager.py:127-157`) →
  *    `unionByName(allowMissingColumns=true)`.
  */
object Relational {

  /** Total deterministic order over all output columns (hash-oracle safety;
    * NULLS FIRST matches the explicit NULLS FIRST in the oracle SQL). */
  def totalOrder(df: DataFrame): DataFrame =
    df.orderBy(df.columns.toSeq.map(c => col(c).asc_nulls_first): _*)

  def orderAll(cols: String*): String =
    "ORDER BY " + cols.map(c => s"$c NULLS FIRST").mkString(", ")

  // ---------------------------------------------------------------- queries

  /** Flagship pricing-summary aggregate (TPC-H Q1 shape) — scan → filter →
    * hash-agg with partial aggregation (map-side combine) → sort. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    totalOrder(
      li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order")))
  }

  /** Column pruning at scan (`usecols`, loader.py:132): only the projected
    * columns reach the parquet reader (ReadSchema). */
  def projectPrune(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")))

  /** Rename `Pulses→pulses` analog (loader.py:134). */
  def projectRename(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .select(col("event_id"), col("value"))
      .withColumnRenamed("value", "pulses"))

  /** Derived constant tag column: buildingID from hostname, uppercased
    * (transfer_manager.py:123,172). */
  def projectAddcolLit(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .select(col("event_id"), col("event_type"))
      .withColumn("buildingID", upper(substring(col("event_type"), 1, 1)))
      .withColumn("measurement", lit("RawData")))

  /** Time-range predicate (get_hot_intake_interval.py:117) — pushed to the
    * scan; at scale this is the partition-pruning path. */
  def filterTimeRange(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .filter(col("ts").between(
        lit("2024-01-03 00:00:00").cast("timestamp"),
        lit("2024-01-05 00:00:00").cast("timestamp")))
      .select(col("event_id"), col("user_id"), col("value")))

  /** Tag-equality predicate (`"buildingID" = 'A'`). */
  def filterTagEq(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .filter(col("event_type") === "click" && col("user_id") % 10 === 3)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value")))

  /** Nonzero pulse detection (get_hot_intake_interval.py:124,141). */
  def filterNonzero(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .filter(col("value") =!= 0.0 && col("value") > 0.5)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))

  /** Prefix filter (datalogger_health_check.py:89 `startswith`). */
  def filterPrefix(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "part")
      .filter(col("p_name").startsWith("small"))
      .select(col("p_partkey"), col("p_name")))

  /** Extension allowlist (web_service.py:55-59; transfer_manager.py:74):
    * case-insensitive `.csv` filter over synthesized filenames. */
  def filterExt(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .withColumn("fname", concat(col("source"), lit("_"), col("doc_id"),
        when(col("doc_id") % 3 === 0, ".csv")
          .when(col("doc_id") % 3 === 1, ".CSV")
          .otherwise(".txt")))
      .filter(lower(substring_index(col("fname"), ".", -1)) === "csv")
      .select(col("doc_id"), col("fname")))

  /** In-flight file exclusion (transfer_manager.py:197 mtime > now): rows
    * newer than the dataset frontier minus 1 hour are still "being
    * written" and excluded; frontier replaces wall clock for determinism. */
  def filterMtime(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    totalOrder(ev
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("frontier"))))
      .filter(col("ts") <= col("frontier") - expr("INTERVAL 1 HOUR"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("newest")))
  }

  /** Deterministic directory listing (sorted glob, loader.py:32-34): the
    * fixture dir's parquet tables via the binaryFile source. */
  def scanDirGlob(spark: SparkSession, dir: String): DataFrame =
    totalOrder(spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.parquet")
      .load(dir)
      .select(element_at(split(col("path"), "/"), -1).as("fname")))

  /** Whole-column overwrite with a computed scalar
    * (`df['hotOutFlowRate'] = value`, get_hot_intake_interval.py:71): every
    * buffered row of the zero-run gets the one derived rate. The scalar here
    * is the reference's own formula at elapsed=23 s: (1/(23+1))*60 = 2.5. */
  def projectSetConst(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"))
      .withColumn("hotOutFlowRate", lit(60.0 / 24.0)))

  /** Retention ordering (memory_manager.py:3-8: files sorted by mtime,
    * oldest deleted first) — ascending time sort with a unique key tail. */
  def sortByMtime(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)

  /** The reference's read query (get_hot_intake_interval.py:117-123:
    * `SELECT "hotOutFlowRate","buildingID" FROM "flow" WHERE time >= … AND
    * time <= … AND "buildingID" = …`) as literal `spark.sql` over the
    * registered measurement view — Catalyst parses/plans exactly what
    * InfluxDB's server did, with the tag+time predicates pushed to the scan. */
  def sourceInfluxql(spark: SparkSession, dir: String): DataFrame = {
    load(spark, dir, "events").createOrReplaceTempView("flow")
    totalOrder(spark.sql(
      """SELECT value AS hotOutFlowRate, user_id AS buildingID, ts AS time
        |FROM flow
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts <= TIMESTAMP '2024-01-06 00:00:00'
        |  AND user_id % 5 = 1""".stripMargin))
  }

  /** Deterministic sort (sorted glob, loader.py:32-34). */
  def sortByKey(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)

  /** Latest-by-mtime top-k ("ls -1t | head", datalogger_health_check.py:88-91)
    * — Catalyst plans TakeOrderedAndProject (no global sort materialized). */
  def topkLatest(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
      .limit(20)

  /** Schema-evolution union: 4-col frames into the 7-col measurement
    * (transfer_manager.py:127-157) → unionByName(allowMissingColumns). */
  def setUnion(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    val seven = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("value"), col("user_id"))
    val four = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("value")) // missing user_id → null
    totalOrder(seven.unionByName(four, allowMissingColumns = true))
  }

  def setIntersect(spark: SparkSession, dir: String): DataFrame =
    totalOrder(
      load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))))

  /** Customers with no high-value order (the new-vs-seen file-sync shape,
    * transfer_manager.py:199-217, as a set difference). */
  def setExcept(spark: SparkSession, dir: String): DataFrame =
    totalOrder(
      load(spark, dir, "customer").select(col("c_custkey").as("custkey"))
        .except(load(spark, dir, "orders")
          .filter(col("o_totalprice") > 150000.0)
          .select(col("o_custkey").as("custkey"))))

  /** Row counting (loader.py:41,136). */
  def aggCount(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers")))

  /** Latest file per host: running max of mtime keeping name
    * (datalogger_health_check.py:86-91) → max_by with a struct tiebreak so
    * ties on ts cannot flap the result. */
  def aggMaxBy(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max_by(col("event_id"), struct(col("ts"), col("event_id"))).as("latest_event"),
        max(col("ts")).as("max_ts")))

  /** Free-space accumulation vs threshold (memory_manager.py:13-16). */
  def aggSumFilter(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("total_chars"), count(lit(1)).as("n_docs"))
      .filter(col("total_chars") > 1000))

  // ---- the spark.sql front door: literal ANSI SQL over registered views
  // (the engine's second query surface next to the DataFrame API and
  // InfluxQL; the SAME text runs in DuckDB, so the oracle is the query) ----

  private val Q3Sql =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |    AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority""".stripMargin

  private val ExistsSql =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0)""".stripMargin

  /** TPC-H Q3 shape through `spark.sql` — shuffle joins with the filters
    * pushed below them, decimal-accumulated revenue. */
  def sqlQ3Shipping(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders", "lineitem")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    totalOrder(spark.sql(Q3Sql))
  }

  /** Correlated EXISTS subquery through `spark.sql` — Catalyst rewrites it
    * to a left-semi join (no per-row subquery execution). */
  def sqlExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "orders")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    totalOrder(spark.sql(ExistsSql))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_q3_shipping" -> sqlQ3Shipping,
    "sql_exists_subquery" -> sqlExistsSubquery,
    "q1_agg" -> q1Agg,
    "project_prune" -> projectPrune,
    "project_rename" -> projectRename,
    "project_addcol_lit" -> projectAddcolLit,
    "filter_time_range" -> filterTimeRange,
    "filter_tag_eq" -> filterTagEq,
    "filter_nonzero" -> filterNonzero,
    "filter_prefix" -> filterPrefix,
    "filter_ext" -> filterExt,
    "filter_mtime" -> filterMtime,
    "scan_dir_glob" -> scanDirGlob,
    "project_set_const" -> projectSetConst,
    "sort_by_mtime" -> sortByMtime,
    "source_influxql" -> sourceInfluxql,
    "sort_by_key" -> sortByKey,
    "topk_latest" -> topkLatest,
    "set_union" -> setUnion,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "agg_count" -> aggCount,
    "agg_max_by" -> aggMaxBy,
    "agg_sum_filter" -> aggSumFilter)

  val oracle: Map[String, String] = Map(
    "sql_q3_shipping" ->
      s"""$Q3Sql
         |${orderAll("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")}""".stripMargin,
    "sql_exists_subquery" ->
      s"""$ExistsSql
         |${orderAll("c_custkey", "c_name")}""".stripMargin,
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  ${sqlDsum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${sqlDavg("l_quantity")} AS avg_qty,
         |  ${sqlDavg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |${orderAll("l_returnflag", "l_linestatus")}""".stripMargin,
    "project_prune" ->
      s"""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         |${orderAll("l_orderkey", "l_linenumber", "l_extendedprice")}""".stripMargin,
    "project_rename" ->
      s"""SELECT event_id, value AS pulses FROM events
         |${orderAll("event_id", "pulses")}""".stripMargin,
    "project_addcol_lit" ->
      s"""SELECT event_id, event_type,
         |  UPPER(SUBSTRING(event_type, 1, 1)) AS buildingID,
         |  'RawData' AS measurement
         |FROM events
         |${orderAll("event_id", "event_type", "buildingID", "measurement")}""".stripMargin,
    "filter_time_range" ->
      s"""SELECT event_id, user_id, value FROM events
         |WHERE CAST(ts AS TIMESTAMP) BETWEEN TIMESTAMP '2024-01-03 00:00:00'
         |  AND TIMESTAMP '2024-01-05 00:00:00'
         |${orderAll("event_id", "user_id", "value")}""".stripMargin,
    "filter_tag_eq" ->
      s"""SELECT event_id, user_id, event_type, value FROM events
         |WHERE event_type = 'click' AND user_id % 10 = 3
         |${orderAll("event_id", "user_id", "event_type", "value")}""".stripMargin,
    "filter_nonzero" ->
      s"""SELECT event_type, COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events WHERE value <> 0.0 AND value > 0.5
         |GROUP BY event_type
         |${orderAll("event_type", "n", "sum_value")}""".stripMargin,
    "filter_prefix" ->
      s"""SELECT p_partkey, p_name FROM part WHERE p_name LIKE 'small%'
         |${orderAll("p_partkey", "p_name")}""".stripMargin,
    "filter_ext" ->
      s"""WITH t AS (
         |  SELECT doc_id, source || '_' || CAST(doc_id AS VARCHAR) ||
         |    (CASE WHEN doc_id % 3 = 0 THEN '.csv'
         |          WHEN doc_id % 3 = 1 THEN '.CSV' ELSE '.txt' END) AS fname
         |  FROM documents)
         |SELECT doc_id, fname FROM t
         |WHERE lower(split_part(fname, '.', -1)) = 'csv'
         |${orderAll("doc_id", "fname")}""".stripMargin,
    "filter_mtime" ->
      s"""SELECT event_type, COUNT(*) AS n,
         |  MAX(CAST(ts AS TIMESTAMP)) AS newest
         |FROM events
         |WHERE CAST(ts AS TIMESTAMP) <=
         |  (SELECT MAX(CAST(ts AS TIMESTAMP)) FROM events) - INTERVAL 1 HOUR
         |GROUP BY event_type
         |${orderAll("event_type", "n", "newest")}""".stripMargin,
    "scan_dir_glob" ->
      s"""SELECT * FROM (VALUES
         |  ('region.parquet'), ('nation.parquet'), ('customer.parquet'),
         |  ('supplier.parquet'), ('part.parquet'), ('orders.parquet'),
         |  ('lineitem.parquet'), ('events.parquet'), ('documents.parquet'),
         |  ('embeddings.parquet')) AS t(fname)
         |${orderAll("fname")}""".stripMargin,
    "project_set_const" ->
      s"""SELECT event_id, user_id, 60.0 / 24.0 AS hotOutFlowRate
         |FROM events WHERE event_type = 'click'
         |${orderAll("event_id", "user_id", "hotOutFlowRate")}""".stripMargin,
    "sort_by_mtime" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events
        |ORDER BY ts ASC NULLS LAST, event_id ASC""".stripMargin,
    "source_influxql" ->
      s"""SELECT value AS hotOutFlowRate, user_id AS buildingID,
         |  CAST(ts AS TIMESTAMP) AS time
         |FROM events
         |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-02 00:00:00'
         |  AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-06 00:00:00'
         |  AND user_id % 5 = 1
         |${orderAll("hotOutFlowRate", "buildingID", "time")}""".stripMargin,
    "sort_by_key" ->
      """SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
        |ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC""".stripMargin,
    "topk_latest" ->
      """SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id FROM events
        |ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST LIMIT 20""".stripMargin,
    "set_union" ->
      s"""SELECT event_id, value, user_id FROM events WHERE event_type = 'click'
         |UNION ALL
         |SELECT event_id, value, NULL AS user_id FROM events WHERE event_type = 'view'
         |${orderAll("event_id", "value", "user_id")}""".stripMargin,
    "set_intersect" ->
      s"""SELECT c_nationkey AS nationkey FROM customer
         |INTERSECT
         |SELECT s_nationkey AS nationkey FROM supplier
         |${orderAll("nationkey")}""".stripMargin,
    "set_except" ->
      s"""SELECT c_custkey AS custkey FROM customer
         |EXCEPT
         |SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 150000.0
         |${orderAll("custkey")}""".stripMargin,
    "agg_count" ->
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders,
         |  COUNT(DISTINCT o_custkey) AS n_customers
         |FROM orders GROUP BY o_orderstatus
         |${orderAll("o_orderstatus", "n_orders", "n_customers")}""".stripMargin,
    "agg_max_by" ->
      s"""SELECT user_id, latest_event, max_ts FROM (
         |  SELECT user_id, event_id AS latest_event,
         |    MAX(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id) AS max_ts,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events) WHERE rn = 1
         |${orderAll("user_id", "latest_event", "max_ts")}""".stripMargin,
    "agg_sum_filter" ->
      s"""SELECT source, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |  COUNT(*) AS n_docs
         |FROM documents GROUP BY source HAVING SUM(n_chars) > 1000
         |${orderAll("source", "total_chars", "n_docs")}""".stripMargin)
}
