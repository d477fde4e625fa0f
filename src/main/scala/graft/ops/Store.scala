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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "store_upsert_roundtrip" -> storeRoundtrip)

  val oracle: Map[String, String] = Map(
    "store_upsert_roundtrip" ->
      s"""SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         |  COUNT(*) AS n,
         |  ${sqlDsum(s"CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') = '$UpsertDay' THEN value * 2 ELSE value END")} AS sum_value,
         |  MAX(CASE WHEN strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') = '$UpsertDay'
         |      THEN event_id + 1000000 ELSE event_id END) AS max_version
         |FROM events GROUP BY 1
         |${orderAll("day", "n", "sum_value", "max_version")}""".stripMargin)
}
