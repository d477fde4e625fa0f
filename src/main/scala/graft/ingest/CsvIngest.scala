package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingest layer (SURVEY.md §2.1, §1.2): the reference's two on-disk
  * formats re-expressed as declarative parses.
  *
  *  - Residential pulse format (loader.py:121-161): 3 metadata header lines
  *    (site / datalogger / meter), each matching
  *    `^([a-zA-Z:0# ]*)(?P<id>\d+)(?P<qc>QC)?`, then `Time,Pulses` data
  *    rows from line 5 on. Parsed via `wholetext` (one row per file —
  *    meter files are small per-site dailies) + posexplode, so per-file
  *    header context never leaves the row it annotates. Tags stay strings
  *    (loader.py:144-145; SURVEY §1.3).
  *  - Campus multi-meter format (transfer_manager.py:87-121): skip row 0,
  *    header row 1, 7-column schema falling back to 4 columns → one
  *    nullable superset schema, PERMISSIVE mode, corrupt rows to a
  *    quarantine channel (loader.py:52-53,60-66).
  *
  * At scale: the campus path is a plain distributed CSV scan (splittable,
  * schema-on-read); the pulse path's wholetext is bounded by per-file size,
  * with file-level parallelism across the fleet of dataloggers.
  */
object CsvIngest {

  val MetaPattern = "^([a-zA-Z:0# ]*)(\\d+)(QC)?"

  /** Campus superset schema: 7 columns with the 3 temps nullable (the
    * 4-column variant simply leaves them null — SURVEY §1.5). */
  val campusSchema: StructType = StructType(Seq(
    StructField("Date", StringType),
    StructField("coldInFlowRate", DoubleType),
    StructField("hotInFlowRate", DoubleType),
    StructField("hotOutFlowRate", DoubleType),
    StructField("hotInTemp", DoubleType),
    StructField("hotOutTemp", DoubleType),
    StructField("coldInTemp", DoubleType),
    StructField("_corrupt", StringType)))

  /** Shared pulse-format parser over (value = whole file text, src_file) —
    * batch and streaming run the identical plan. Lenient (`try_*`) so junk
    * data lines surface as `is_bad = true` for the quarantine fork
    * (loader.py:48-66) instead of failing the whole scan under ANSI mode.
    * Output adds `row` (the raw data line) and `is_bad` to the parsed
    * columns. */
  def parsePulseText(files: DataFrame): DataFrame = {
    val lines = files
      .withColumn("lines", split(col("value"), "\r?\n"))
      .withColumn("siteID", regexp_extract(element_at(col("lines"), 1), MetaPattern, 2))
      .withColumn("dataloggerID", regexp_extract(element_at(col("lines"), 2), MetaPattern, 2))
      .withColumn("meterID", regexp_extract(element_at(col("lines"), 3), MetaPattern, 2))
      .withColumn("qc",
        regexp_extract(element_at(col("lines"), 3), MetaPattern, 3) === "QC")
      .select(col("src_file"), col("siteID"), col("dataloggerID"),
        col("meterID"), col("qc"),
        posexplode(slice(col("lines"), 5, Int.MaxValue)).as(Seq("line_no", "row")))
    lines
      .filter(length(trim(col("row"))) > 0)
      .withColumn("time",
        try_to_timestamp(expr("try_element_at(split(row, ',', -1), 1)"),
          lit("yyyy-MM-dd HH:mm:ss")))
      .withColumn("pulses",
        expr("try_cast(try_element_at(split(row, ',', -1), 2) AS BIGINT)"))
      // a file whose metadata lines carry no id fails the whole-file parse
      // in the reference (loader.py:49-54 AttributeError → quarantine);
      // row-level that means every row of the file goes to the dead letter
      .withColumn("is_bad", col("time").isNull || col("pulses").isNull
        || col("siteID") === "" || col("dataloggerID") === "")
      // measurement routing by QC flag (loader.py:16-19,56)
      .select(
        when(col("qc"), "QCData").otherwise("RawData").as("measurement"),
        col("siteID"), col("dataloggerID"), col("meterID"), col("qc"),
        col("time"), col("pulses"), col("src_file"), col("row"), col("is_bad"))
  }

  /** Parse residential pulse CSVs: each file yields rows
    * (siteID, dataloggerID, meterID, qc, time, pulses, src_file).
    * Lines 1-3 are metadata, line 4 is the `Time,Pulses` header. */
  def readPulseCsv(spark: SparkSession, path: String): DataFrame = {
    val files = spark.read.option("wholetext", "true").text(path)
      .withColumn("src_file", input_file_name())
    parsePulseText(files).filter(!col("is_bad"))
      .select("measurement", "siteID", "dataloggerID", "meterID", "qc",
        "time", "pulses", "src_file")
  }

  /** 4-column fallback schema (transfer_manager.py:113-118). */
  val campus4Schema: StructType = StructType(Seq(
    StructField("Date", StringType),
    StructField("coldInFlowRate", DoubleType),
    StructField("hotInFlowRate", DoubleType),
    StructField("hotOutFlowRate", DoubleType)))

  /** Parse campus CSVs: try the 7-column schema; rows that fail it are
    * re-parsed with the 4-column fallback via `from_csv` (the reference's
    * try-then-fallback, transfer_manager.py:104-121, done row-wise in one
    * pass instead of re-reading the file); rows failing both land in the
    * quarantine channel. The buildingID tag derives from the filename
    * (hostname convention, transfer_manager.py:123,172). */
  def readCampusCsv(spark: SparkSession, path: String): DataFrame = {
    val parsed = spark.read
      .schema(campusSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      // skiprows=[0]: the reference files carry a title line before the
      // header; Spark's multi-line skip is expressed by treating the title
      // as a comment line (files are written with '#' title prefix here)
      .option("comment", "#")
      .csv(path)
      .withColumn("src_file", input_file_name())
      // cache: Spark disallows queries projecting only the corrupt-record
      // column of a raw CSV scan; materializing first lifts the restriction
      .cache()
    val fallback = from_csv(col("_corrupt"), campus4Schema, Map.empty[String, String])
    parsed
      .withColumn("_fb", when(col("_corrupt").isNotNull, fallback))
      .withColumn("variant",
        when(col("_corrupt").isNull, "7col")
          .when(col("_fb.Date").isNotNull && col("_fb.coldInFlowRate").isNotNull
            && col("_fb.hotInFlowRate").isNotNull
            && col("_fb.hotOutFlowRate").isNotNull, "4col")
          .otherwise("corrupt"))
      .select(
        col("src_file"),
        // building = first char after 'llc-', uppercased
        // (transfer_manager.py:172 host[find('llc-')+4] + :123 .upper())
        upper(regexp_extract(col("src_file"), "llc-(.)", 1)).as("buildingID"),
        col("variant"),
        coalesce(col("Date"), col("_fb.Date")).as("Date"),
        coalesce(col("coldInFlowRate"), col("_fb.coldInFlowRate")).as("coldInFlowRate"),
        coalesce(col("hotInFlowRate"), col("_fb.hotInFlowRate")).as("hotInFlowRate"),
        coalesce(col("hotOutFlowRate"), col("_fb.hotOutFlowRate")).as("hotOutFlowRate"),
        col("hotInTemp"), col("hotOutTemp"), col("coldInTemp"),
        col("_corrupt"))
      // try_to_timestamp: corrupt rows carry junk in Date; under ANSI a
      // strict to_timestamp would fail the scan instead of quarantining
      .withColumn("time",
        try_to_timestamp(col("Date"), lit("yyyy-MM-dd HH:mm:ss")))
  }

  /** Split a parsed campus frame into (good, quarantine) — the loader's
    * move-to-quarantine (loader.py:48-66) as a dataflow fork. Good rows
    * are the 7-col parses plus the 4-col fallback recoveries. */
  def quarantineSplit(df: DataFrame): (DataFrame, DataFrame) = {
    val good = df.filter(col("variant") =!= "corrupt").drop("_corrupt")
    val bad = df.filter(col("variant") === "corrupt")
      .select(col("src_file"), col("_corrupt").as("raw_line"))
    (good, bad)
  }
}
