package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** InfluxDB line-protocol parser (SURVEY.md §2.1): the reference's write
  * path is `write_points(..., protocol='line')` (loader.py:171-181,
  * transfer_manager.py:140-142) — text lines shaped
  *
  * {{{ measurement,tag1=v1,tag2=v2 field1=1.5,field2=42i,ok=true 1704067200000000000 }}}
  *
  * re-expressed as ONE declarative plan (no UDFs, no per-partition code):
  * sentinel-rewrite the `\ ` / `\,` / `\=` escapes, regex-split the three
  * sections, `str_to_map` the tag set, explode the field set, and type
  * each field value by its line-protocol lexical form. Output is LONG
  * format — one row per (point, field) with exactly one of
  * `f_double`/`f_long`/`f_str`/`f_bool` set — which is the shape a store
  * append pivots or filters from. Unparseable lines surface as
  * `is_bad = true` (the quarantine-channel convention the CSV ingest
  * uses, loader.py:48-66) instead of failing the scan.
  *
  * Scale: a line is parsed entirely within its own row — the plan is a
  * stateless projection + one explode, fully codegen'd, splittable across
  * whatever file parallelism the source provides. Raw spaces, commas and
  * equals INSIDE double-quoted string values — valid line protocol, all
  * unescaped — are handled by masking quoted runs before the structural
  * splits: `\"` becomes a sentinel first, then the line splits on the
  * remaining (real) quote delimiters and the separators inside every odd
  * segment are sentineled — a declarative scanner in one `transform`.
  * Still-unparseable lines land in the quarantine channel loudly — and
  * ATOMICALLY: badness is decided per LINE before the field explode, so a
  * line with one unparseable field never half-ingests its other fields.
  */
object LineProtocol {

  // single-char sentinels for the escapable characters; restored after the
  // structural splits so tag/field names and values keep the raw chars
  private val EscSpace = "\u0001"
  private val EscComma = "\u0002"
  private val EscEq = "\u0003"
  private val EscQuote = "\u0004"

  private val LineRe = "^([^ ]+) ([^ ]+)( [0-9]+)?[ ]*$"

  private def restore(c: Column): Column =
    translate(c, EscSpace + EscComma + EscEq + EscQuote, " ,=\"")

  /** Parse a frame with a `line` string column (extra columns ride along).
    * Returns one row per (point, field): measurement, tags (map), time
    * (null when the line has no timestamp — the caller supplies receive
    * time, as InfluxDB's server does), field_key, the four typed value
    * columns, and `is_bad`. */
  def parseLines(lines: DataFrame): DataFrame = {
    val sent = lines
      .filter(length(trim(col("line"))) > 0 && !col("line").startsWith("#"))
      // quoted-run masking: `\"` first (so remaining quotes are REAL
      // delimiters), then split on quotes and sentinel the separators
      // inside every odd (= inside-quotes) segment — raw spaces/commas/
      // equals in string values stop confusing the structural regexes
      .withColumn("__l", regexp_replace(col("line"), "\\\\\"", EscQuote))
      .withColumn("__l", array_join(expr(
        s"""transform(split(__l, '"'), (s, i) ->
           |  IF(i % 2 = 1, translate(s, ' ,=', '$EscSpace$EscComma$EscEq'), s))"""
          .stripMargin), "\""))
      .withColumn("__l",
        regexp_replace(regexp_replace(regexp_replace(col("__l"),
          "\\\\ ", EscSpace), "\\\\,", EscComma), "\\\\=", EscEq))
      .withColumn("__mt", regexp_extract(col("__l"), LineRe, 1))
      .withColumn("__fs", regexp_extract(col("__l"), LineRe, 2))
      .withColumn("__ts", trim(regexp_extract(col("__l"), LineRe, 3)))
    val shaped = sent
      .withColumn("measurement", restore(substring_index(col("__mt"), ",", 1)))
      .withColumn("tags", expr(
        "CASE WHEN instr(__mt, ',') > 0 THEN " +
          "str_to_map(substring(__mt, instr(__mt, ',') + 1), ',', '=') " +
          "ELSE map() END"))
      // the structural split is done — put the escaped chars back into
      // tag keys and values
      .withColumn("tags", transform_values(
        transform_keys(col("tags"), (k, _) => restore(k)),
        (_, v) => restore(v)))
      .withColumn("time", expr(
        "CASE WHEN __ts != '' THEN " +
          "timestamp_micros(try_cast(__ts AS BIGINT) DIV 1000) END"))
      // line-level badness so quarantine is atomic per line: any
      // comma-split fragment that isn't key=value with a typeable value
      // (the same four lexical forms the explode path types below) marks
      // EVERY row of the line bad — e.g. an UNBALANCED quote leaves a
      // fragment whose value never matches `^".*"$`, so the whole line is
      // quarantined instead of partially ingested. (Separators inside
      // BALANCED quotes were masked above and no longer mis-split.)
      // Per-row exists(), no shuffle.
      .withColumn("__badLine", col("__mt") === "" || col("__fs") === "" ||
        // instr <= 1 also rejects an EMPTY field key (`=5`) — invalid
        // line protocol that the typed-value checks alone would admit
        expr("""exists(split(__fs, ','), f -> instr(f, '=') <= 1 OR NOT (
             substring(f, instr(f, '=') + 1) RLIKE '^".*"$'
          OR substring(f, instr(f, '=') + 1) RLIKE '^-?[0-9]+i$'
          OR substring(f, instr(f, '=') + 1) RLIKE '^(?i)(t|true|f|false)$'
          OR try_cast(substring(f, instr(f, '=') + 1) AS DOUBLE) IS NOT NULL))"""))
    val fields = shaped
      .withColumn("__f", explode(split(col("__fs"), ",")))
      .withColumn("field_key",
        restore(substring_index(col("__f"), "=", 1)))
      .withColumn("__v", expr(
        "substring(__f, length(substring_index(__f, '=', 1)) + 2)"))
    val typed = fields
      .withColumn("f_str", when(col("__v").rlike("^\".*\"$"),
        // quotes stripped; restore() covers the masked `\"` sentinel too
        restore(expr("substring(__v, 2, length(__v) - 2)"))))
      .withColumn("f_long", when(col("__v").rlike("^-?[0-9]+i$"),
        expr("try_cast(substring(__v, 1, length(__v) - 1) AS BIGINT)")))
      .withColumn("f_bool", when(col("__v").rlike("^(?i)(t|true|f|false)$"),
        lower(col("__v")).startsWith("t")))
      .withColumn("f_double",
        when(col("f_str").isNull && col("f_long").isNull &&
          col("f_bool").isNull, expr("try_cast(__v AS DOUBLE)")))
    typed
      .withColumn("is_bad", col("__badLine") ||
        (col("f_str").isNull && col("f_long").isNull &&
          col("f_bool").isNull && col("f_double").isNull) ||
        (col("__ts") =!= "" && col("time").isNull))
      .drop("__l", "__mt", "__fs", "__ts", "__f", "__v", "__badLine")
  }

  /** Restore the tag map into flat columns for a known tag set — the
    * store-append shape (tags are columns in the measurement layout). */
  def tagCols(df: DataFrame, tagKeys: Seq[String]): DataFrame =
    tagKeys.foldLeft(df)((d, k) =>
      d.withColumn(k, element_at(col("tags"), k)))

  /** Pivot one measurement's good (point, field) rows to the WIDE layout a
    * [[graft.store.MeasurementStore]] measurement holds: one row per
    * (tags, time) with a column per field key (numeric fields as double —
    * InfluxDB's float type; integer fields keep their value exactly up to
    * 2^53, the same contract the float wire type gives InfluxDB). The
    * field-key list is collected first — bounded metadata, like the pivot
    * op's value list, never data-sized. */
  def toMeasurement(parsed: DataFrame, measurement: String,
    tagKeys: Seq[String]): DataFrame = {
    val good = tagCols(parsed, tagKeys)
      .filter(!col("is_bad") && col("measurement") === measurement &&
        col("time").isNotNull)
    val keys = good.select("field_key").distinct().collect()
      .map(_.getString(0)).sorted.toIndexedSeq
    val num = coalesce(col("f_double"), col("f_long").cast("double"))
    good.groupBy((col("time") +: tagKeys.map(col)): _*)
      .agg(
        // last-write-wins inside a batch is the store upsert's job; within
        // one line a field key appears once, so max is exact
        keys.map(k => max(when(col("field_key") === k, num)).as(k)).head,
        keys.map(k => max(when(col("field_key") === k, num)).as(k)).tail: _*)
  }
}
