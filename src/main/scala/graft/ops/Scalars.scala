package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** Scalar-function surface (SURVEY.md §2.7): every ad-hoc Python scalar in
  * the reference re-expressed as a codegen'd Catalyst built-in (zero UDFs —
  * each stays inside WholeStageCodegen, which is the difference between a
  * fused loop and a per-row interpreter at 100 TB).
  */
object Scalars {
  import Relational.{totalOrder, orderAll}

  /** Metadata-header tag extraction (loader.py:140-145 regex
    * `^([a-zA-Z:0# ]*)(?P<id>\d+)(?P<qc>QC)?`): id and QC flag pulled from a
    * synthesized header line; numeric-looking ids stay strings (tags are
    * strings, SURVEY §1.3). */
  def strRegexExtract(spark: SparkSession, dir: String): DataFrame = {
    val pat = "^([a-zA-Z: #]*)(\\d+)(QC)?"
    totalOrder(load(spark, dir, "part")
      .withColumn("header",
        concat(lit("Site: "), col("p_partkey").cast("string"),
          when(col("p_size") % 2 === 0, lit("QC")).otherwise(lit(""))))
      .select(col("p_partkey"), col("header"),
        regexp_extract(col("header"), pat, 2).as("site_id"),
        (regexp_extract(col("header"), pat, 3) === "QC").as("is_qc")))
  }

  /** Site-name normalization (transfer_manager.py:67-70: drop ' ', ':', '0',
    * map '#'→'_', lowercase) via one char-wise translate. */
  def strTranslateLower(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        lower(translate(col("c_name"), "# :0", "_")).as("site_key")))

  /** Filename surgery: extension split (web_service.py:55), stem uppercase
    * (transfer_manager.py:123), prefix test (datalogger_health_check.py:89). */
  def strSplitext(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "part")
      .withColumn("fname",
        concat(regexp_replace(lower(col("p_name")), " ", "_"), lit(".csv")))
      .select(col("p_partkey"), col("fname"),
        substring_index(col("fname"), ".", -1).as("ext"),
        upper(substring_index(col("fname"), ".", 1)).as("stem_upper"),
        col("fname").startsWith("s").as("is_s")))

  /** Case mapping (transfer_manager.py:123 buildingID uppercase): upper /
    * lower / length over customer names. */
  def strUpper(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_name")).as("name_lower"),
        length(col("c_name")).as("name_len")))

  /** Prefix / suffix / containment predicates as scalar columns
    * (datalogger_health_check.py:89 `startswith('multi_meter')`). */
  def strStartswith(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "part")
      .select(col("p_partkey"), col("p_name"),
        col("p_name").startsWith("multi").as("is_multi"),
        col("p_name").endsWith("e").as("ends_e"),
        col("p_name").contains("al").as("has_al")))

  /** Staleness cutoff arithmetic (datalogger_health_check.py:92-93
    * `now − timedelta(days=2)`): per-user newest event vs the dataset
    * frontier minus 2 days (frontier replaces wall clock for determinism). */
  def dateSubDays(spark: SparkSession, dir: String): DataFrame = {
    val ev = load(spark, dir, "events")
    totalOrder(ev.groupBy(col("user_id")).agg(max(col("ts")).as("newest"))
      .crossJoin(broadcast(ev.agg(max(col("ts")).as("frontier"))))
      .select(col("user_id"), col("newest"),
        (col("frontier") - expr("INTERVAL 2 DAYS")).as("cutoff"),
        (col("newest") < col("frontier") - expr("INTERVAL 2 DAYS")).as("is_stale")))
  }

  /** Token-string build (auth.py:73-74 `':'.join(filenames)`): deterministic
    * ordered string_agg per group. */
  def strConcatJoin(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "supplier")
      .groupBy(col("s_nationkey"))
      .agg(concat_ws(":", sort_array(collect_list(col("s_name")))).as("names"),
        count(lit(1)).as("n")))

  /** Timestamp round-trips: yearfirst parse (loader.py:196-200) and the ISO-Z
    * strptime→epoch of time_elapsed (get_hot_intake_interval.py:61-65). */
  def dateParse(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "orders")
      .withColumn("s_yearfirst", date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("s_iso_z", date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .select(col("o_orderkey"), col("s_yearfirst"), col("s_iso_z"),
        to_timestamp(col("s_yearfirst"), "yyyy-MM-dd HH:mm:ss").as("t_parsed"),
        unix_timestamp(to_timestamp(col("s_iso_z"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
          .as("epoch_s")))

  /** Hour truncation + epoch (auth.py:78-80 hourly salt) and the 2-day
    * staleness cutoff (datalogger_health_check.py:92-93). */
  def dateTruncHour(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .select(col("event_id"), col("ts"),
        date_trunc("HOUR", col("ts")).as("hour_bucket"),
        unix_timestamp(date_trunc("HOUR", col("ts"))).as("hourly_salt"),
        (col("ts") - expr("INTERVAL 2 DAYS")).as("cutoff"),
        datediff(col("ts"), lit("2024-01-01").cast("date")).as("days_since")))

  /** Upload-token digest (auth.py:71-80): sha256 over
    * `salt:secret:filenames`, hex — plus md5/crc32 parity. */
  def hashSha256(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "documents")
      .withColumn("payload", concat_ws(":",
        unix_timestamp(lit("2024-01-01 12:00:00").cast("timestamp")),
        lit("secret"), col("source"), col("doc_id")))
      .select(col("doc_id"), col("payload"),
        sha2(col("payload"), 256).as("token"),
        md5(col("payload")).as("token_md5")))

  /** JSON field access (events.props; config/Slack JSON in the reference,
    * common.py:8-18) — pushdown-friendly string path, then typed cast. */
  def jsonGet(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .select(col("event_id"), col("props"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .filter(col("k") % 7 === 0))

  /** Rate arithmetic (determine_interval, get_hot_intake_interval.py:56-58)
    * + integer math parity: all plain codegen'd column expressions. */
  def mathRate(spark: SparkSession, dir: String): DataFrame =
    totalOrder(load(spark, dir, "events")
      .select(col("event_id"), col("value"),
        (lit(60.0) / (col("value") + 1)).as("rate"),
        floor(col("value")).as("v_floor"),
        ceil(col("value")).as("v_ceil"),
        abs(col("value") - 100.0).as("dist_100"),
        (col("event_id") % 16).as("bucket")))

  /** Lambda higher-order array functions over embeddings (SURVEY §2.7
    * array row): element count, slice, and an exact fused dot-product-with-
    * self (norm²) via transform+aggregate — decimal-accumulated so the fold
    * is order-independent. This is the scalar core of the ANN/dedup ops. */
  def fnArray(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark) // VecDotRewrite fuses norm_sq
    totalOrder(load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).cast(DoubleType).as("first_dim"),
        // sequential double fold in array order: both engines evaluate the
        // identical IEEE operation sequence, so the result is bit-stable
        // (unlike a shuffled SUM over unnested elements).
        aggregate(col("embedding"), lit(0.0),
          (acc, x) => acc + x.cast(DoubleType) * x.cast(DoubleType))
          .as("norm_sq")))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "str_regex_extract" -> strRegexExtract,
    "str_translate_lower" -> strTranslateLower,
    "str_upper" -> strUpper,
    "str_startswith" -> strStartswith,
    "date_sub_days" -> dateSubDays,
    "str_splitext" -> strSplitext,
    "str_concat_join" -> strConcatJoin,
    "date_parse" -> dateParse,
    "date_trunc_hour" -> dateTruncHour,
    "hash_sha256" -> hashSha256,
    "json_get" -> jsonGet,
    "math_rate" -> mathRate,
    "fn_array" -> fnArray)

  val oracle: Map[String, String] = Map(
    "str_regex_extract" ->
      s"""WITH t AS (
         |  SELECT p_partkey,
         |    'Site: ' || CAST(p_partkey AS VARCHAR) ||
         |      (CASE WHEN p_size % 2 = 0 THEN 'QC' ELSE '' END) AS header
         |  FROM part)
         |SELECT p_partkey, header,
         |  regexp_extract(header, '^([a-zA-Z: #]*)(\\d+)(QC)?', 2) AS site_id,
         |  regexp_extract(header, '^([a-zA-Z: #]*)(\\d+)(QC)?', 3) = 'QC' AS is_qc
         |FROM t
         |${orderAll("p_partkey", "header", "site_id", "is_qc")}""".stripMargin,
    "str_translate_lower" ->
      s"""SELECT c_custkey, c_name,
         |  lower(replace(replace(replace(replace(c_name,'#','_'),' ',''),':',''),'0',''))
         |    AS site_key
         |FROM customer
         |${orderAll("c_custkey", "c_name", "site_key")}""".stripMargin,
    "str_upper" ->
      s"""SELECT c_custkey, c_name, upper(c_name) AS name_upper,
         |  lower(c_name) AS name_lower, length(c_name) AS name_len
         |FROM customer
         |${orderAll("c_custkey", "c_name", "name_upper", "name_lower", "name_len")}""".stripMargin,
    "str_startswith" ->
      s"""SELECT p_partkey, p_name,
         |  starts_with(p_name, 'multi') AS is_multi,
         |  ends_with(p_name, 'e') AS ends_e,
         |  contains(p_name, 'al') AS has_al
         |FROM part
         |${orderAll("p_partkey", "p_name", "is_multi", "ends_e", "has_al")}""".stripMargin,
    "date_sub_days" ->
      s"""WITH f AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS frontier FROM events)
         |SELECT user_id, MAX(CAST(ts AS TIMESTAMP)) AS newest,
         |  (SELECT frontier - INTERVAL 2 DAY FROM f) AS cutoff,
         |  MAX(CAST(ts AS TIMESTAMP)) <
         |    (SELECT frontier - INTERVAL 2 DAY FROM f) AS is_stale
         |FROM events GROUP BY user_id
         |${orderAll("user_id", "newest", "cutoff", "is_stale")}""".stripMargin,
    "str_splitext" ->
      s"""WITH t AS (
         |  SELECT p_partkey, replace(lower(p_name), ' ', '_') || '.csv' AS fname
         |  FROM part)
         |SELECT p_partkey, fname,
         |  split_part(fname, '.', -1) AS ext,
         |  upper(split_part(fname, '.', 1)) AS stem_upper,
         |  starts_with(fname, 's') AS is_s
         |FROM t
         |${orderAll("p_partkey", "fname", "ext", "stem_upper", "is_s")}""".stripMargin,
    "str_concat_join" ->
      s"""SELECT s_nationkey,
         |  string_agg(s_name, ':' ORDER BY s_name) AS names, COUNT(*) AS n
         |FROM supplier GROUP BY s_nationkey
         |${orderAll("s_nationkey", "names", "n")}""".stripMargin,
    "date_parse" ->
      s"""WITH t AS (
         |  SELECT o_orderkey,
         |    strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS s_yearfirst,
         |    strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS s_iso_z
         |  FROM orders)
         |SELECT o_orderkey, s_yearfirst, s_iso_z,
         |  strptime(s_yearfirst, '%Y-%m-%d %H:%M:%S') AS t_parsed,
         |  CAST(epoch(strptime(s_iso_z, '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS epoch_s
         |FROM t
         |${orderAll("o_orderkey", "s_yearfirst", "s_iso_z", "t_parsed", "epoch_s")}""".stripMargin,
    "date_trunc_hour" ->
      s"""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
         |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour_bucket,
         |  CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hourly_salt,
         |  CAST(ts AS TIMESTAMP) - INTERVAL 2 DAY AS cutoff,
         |  date_diff('day', DATE '2024-01-01', CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS days_since
         |FROM events
         |${orderAll("event_id", "ts", "hour_bucket", "hourly_salt", "cutoff", "days_since")}""".stripMargin,
    "hash_sha256" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(epoch(TIMESTAMP '2024-01-01 12:00:00') AS BIGINT)
         |      || ':secret:' || source || ':' || CAST(doc_id AS VARCHAR) AS payload
         |  FROM documents)
         |SELECT doc_id, payload, sha256(payload) AS token, md5(payload) AS token_md5
         |FROM t
         |${orderAll("doc_id", "payload", "token", "token_md5")}""".stripMargin,
    "json_get" ->
      s"""SELECT event_id, props,
         |  CAST(json_extract_string(props, '$$.k') AS INTEGER) AS k
         |FROM events
         |WHERE CAST(json_extract_string(props, '$$.k') AS INTEGER) % 7 = 0
         |${orderAll("event_id", "props", "k")}""".stripMargin,
    "math_rate" ->
      s"""SELECT event_id, value,
         |  60.0 / (value + 1) AS rate,
         |  CAST(floor(value) AS BIGINT) AS v_floor,
         |  CAST(ceil(value) AS BIGINT) AS v_ceil,
         |  abs(value - 100.0) AS dist_100,
         |  event_id % 16 AS bucket
         |FROM events
         |${orderAll("event_id", "value", "rate", "v_floor", "v_ceil")}""".stripMargin,
    "fn_array" ->
      s"""SELECT vec_id, label, len(embedding) AS dim,
         |  CAST(embedding[1] AS DOUBLE) AS first_dim,
         |  list_aggregate(list_transform(embedding,
         |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') AS norm_sq
         |FROM embeddings
         |${orderAll("vec_id", "label", "dim", "first_dim", "norm_sq")}""".stripMargin)
}
