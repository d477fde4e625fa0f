package graft.ops

import graft.Tables._
import graft.store.MeasurementStore
import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Store-layer operators (SURVEY.md §2.1 sink_influx_write / §4 custom work
  * 1-2): measurement write → idempotent upsert → pruned read, end-to-end
  * through real partitioned parquet on disk. The oracle reconstructs the
  * expected post-upsert state straight from the fixture, so the whole
  * write/merge/read path is differentially checked.
  */
object Store {
  import Relational.{totalOrder, orderAll}

  private val UpsertDay = "2024-01-03"

  /** Append events as measurement points, upsert a doubled-value revision
    * of one day (last-write-wins on (tags, time)), then read back the
    * per-day aggregate. Only the revised day's partition is rewritten. */
  def storeRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("measurements").toString
    val store = new MeasurementStore(spark, root)
    val points = load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"), col("event_id").as("version"))
    store.append("RawData", points)
    val updates = points
      .filter(date_format(col("time"), "yyyy-MM-dd") === UpsertDay)
      .withColumn("value", col("value") * 2)
      .withColumn("version", col("version") + 1000000)
    store.upsert("RawData", updates,
      keys = Seq("event_type", "user_id", "time"), versionCol = "version")
    totalOrder(store.read("RawData")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        max(col("version")).as("max_version")))
  }

  /** sink_influx_write (loader.py:164-183; transfer_manager.py:126-157):
    * the measurement-routed batched write path. Points split by QC flag
    * into RawData/QCData (the loader's measurement_name_map, loader.py:16-19),
    * written through the store's day-partitioned layout with bounded file
    * sizes (`maxRecordsPerFile` = the 2000-point batch_size analog), then
    * read back per measurement/day. */
  def sinkInfluxWrite(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("sink_influx").toString
    val store = new MeasurementStore(spark, root)
    val points = load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    val prev = spark.conf.getOption("spark.sql.files.maxRecordsPerFile")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "2000")
    try {
      store.append("RawData", points.filter(col("user_id") % 2 =!= 0))
      store.append("QCData", points.filter(col("user_id") % 2 === 0))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.files.maxRecordsPerFile", v)
        case None => spark.conf.unset("spark.sql.files.maxRecordsPerFile")
      }
    }
    val back = store.read("RawData").withColumn("measurement", lit("RawData"))
      .unionByName(store.read("QCData").withColumn("measurement", lit("QCData")))
    totalOrder(back.groupBy(col("measurement"), col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value")))
  }

  private val DeleteBound = "2024-01-03 12:00:00"

  /** InfluxQL DELETE roundtrip (memory_manager.py:8-17 as one statement):
    * write events as points, `DELETE WHERE time < mid-day bound` — whole
    * days before the bound drop as metadata ops, the boundary day is
    * rewritten through the crash-safe swap — then read back per-day
    * aggregates; the oracle reconstructs the survivors from the fixture. */
  def storeDeleteRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("store_delete").toString
    val store = new MeasurementStore(spark, root)
    val points = load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("RawData", points)
    val (dropped, rewritten) =
      store.deleteWhere(s"DELETE FROM RawData WHERE time < '$DeleteBound'")
    require(dropped.nonEmpty && rewritten.nonEmpty,
      s"delete exercised nothing: dropped=$dropped rewritten=$rewritten")
    totalOrder(store.read("RawData")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        min(col("time")).as("min_time")))
  }

  /** InfluxQL DROP SERIES roundtrip — the decommissioned-site workflow:
    * write events as points, `DROP SERIES WHERE event_type = 'error'`
    * (every point of that series across all time, only containing days
    * rewritten), read back per-day aggregates of the survivors. */
  def storeDropSeries(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("store_drop_series").toString
    val store = new MeasurementStore(spark, root)
    val points = load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("RawData", points)
    val rewritten =
      store.dropSeries("DROP SERIES FROM RawData WHERE event_type = 'error'")
    require(rewritten.nonEmpty, "drop series exercised nothing")
    totalOrder(store.read("RawData")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        count_distinct(col("event_type")).as("kinds")))
  }

  private val SeriesWindowBound = "2024-01-04 06:00:00"

  /** Tag-scoped DELETE roundtrip — the site decommission that keeps recent
    * data for audit: write events as points, `DELETE WHERE event_type =
    * 'error' AND time < bound` (one series, bounded window; every touched
    * day still holds other series, so all are rewritten to survivors in
    * one job), read back per-day aggregates. */
  def storeDeleteSeriesWindow(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("store_delete_sw").toString
    val store = new MeasurementStore(spark, root)
    val points = load(spark, dir, "events")
      .select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("RawData", points)
    val (dropped, rewritten) = store.deleteWhere(
      s"DELETE FROM RawData WHERE event_type = 'error' AND time < '$SeriesWindowBound'")
    require(dropped.isEmpty && rewritten.nonEmpty,
      s"series-window delete exercised nothing: $rewritten")
    totalOrder(store.read("RawData")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        count(when(col("event_type") === "error", 1)).as("n_error")))
  }

  /** Compaction roundtrip under the correctness gate: write events as two
    * appends (every day lands ≥ 2 files — the reference's accumulating
    * per-site daily batches), compact to one file per day through the
    * crash-safe swap, then read back per-day aggregates — the oracle proves
    * the rewrite is content-exact while the file counts prove it actually
    * compacted. */
  def storeCompact(spark: SparkSession, dir: String): DataFrame = {
    val root = Files.createTempDirectory("store_compact").toString
    val store = new MeasurementStore(spark, root)
    val ev = load(spark, dir, "events")
    def sel(df: DataFrame): DataFrame =
      df.select(col("event_type"), col("user_id"), col("ts").as("time"),
        col("value"))
    store.append("RawData", sel(ev.filter(col("event_id") % 2 === 0)))
    store.append("RawData", sel(ev.filter(col("event_id") % 2 =!= 0)))
    val report = store.compact("RawData", filesPerDay = 1)
    require(report.nonEmpty && report.forall(_._3 == 1) &&
      report.exists(_._2 > 1),
      s"compaction exercised nothing: $report")
    totalOrder(store.read("RawData")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"),
        min(col("time")).as("min_time"), max(col("time")).as("max_time")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_compact" -> storeCompact,
    "store_delete_series_window" -> storeDeleteSeriesWindow,
    "store_upsert_roundtrip" -> storeRoundtrip,
    "store_delete_roundtrip" -> storeDeleteRoundtrip,
    "store_drop_series" -> storeDropSeries,
    "sink_influx_write" -> sinkInfluxWrite)

  val oracle: Map[String, String] = Map(
    "store_compact" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value,
         |  MIN(CAST(ts AS TIMESTAMP)) AS min_time,
         |  MAX(CAST(ts AS TIMESTAMP)) AS max_time
         |FROM events GROUP BY 1
         |${orderAll("day", "n", "sum_value", "min_time", "max_time")}""".stripMargin,
    "store_delete_series_window" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
         |FROM events
         |WHERE NOT (event_type = 'error'
         |  AND CAST(ts AS TIMESTAMP) < TIMESTAMP '$SeriesWindowBound')
         |GROUP BY 1
         |${orderAll("day", "n", "sum_value", "n_error")}""".stripMargin,
    "store_upsert_roundtrip" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n,
         |  ${sqlDsum(s"CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') = '$UpsertDay' THEN value * 2 ELSE value END")} AS sum_value,
         |  MAX(CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') = '$UpsertDay'
         |      THEN event_id + 1000000 ELSE event_id END) AS max_version
         |FROM events GROUP BY 1
         |${orderAll("day", "n", "sum_value", "max_version")}""".stripMargin,
    "store_delete_roundtrip" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value,
         |  MIN(CAST(ts AS TIMESTAMP)) AS min_time
         |FROM events
         |WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '$DeleteBound'
         |GROUP BY 1
         |${orderAll("day", "n", "sum_value", "min_time")}""".stripMargin,
    "store_drop_series" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value,
         |  COUNT(DISTINCT event_type) AS kinds
         |FROM events
         |WHERE event_type <> 'error'
         |GROUP BY 1
         |${orderAll("day", "n", "sum_value", "kinds")}""".stripMargin,
    "sink_influx_write" ->
      s"""SELECT
         |  CASE WHEN user_id % 2 = 0 THEN 'QCData' ELSE 'RawData' END
         |    AS measurement,
         |  strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2
         |${orderAll("measurement", "day", "n", "sum_value")}""".stripMargin)
}
