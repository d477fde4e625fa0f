package graft.ops

import graft.Tables._
import graft.ingest.CsvIngest
import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest operators as driver-contract queries (SURVEY.md §2.1): each
  * synthesizes deterministic CSV files from the fixture tables, runs the
  * real ingest path over them, and returns the parsed frame — so the DuckDB
  * oracle can reconstruct the expected output straight from the fixtures
  * without ever seeing the CSVs.
  */
object Ingest {
  import Relational.{totalOrder, orderAll}

  /** Events slice used to generate pulse files: first 50 rows (by ts,
    * event_id) of users 1-3. */
  private def pulseSlice(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    load(spark, dir, "events")
      .filter(col("user_id").between(1, 3))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 50)
  }

  private def writeFile(dir: Path, name: String, content: String): Unit =
    Files.writeString(dir.resolve(name), content)

  /** scan_csv_pulses: write one residential-format file per user (3
    * metadata lines + Time,Pulses rows, loader.py:121-161), ingest through
    * [[CsvIngest.readPulseCsv]], return the tagged points. */
  def scanCsvPulses(spark: SparkSession, dir: String): DataFrame = {
    val rows = pulseSlice(spark, dir)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"),
        floor(col("value")).cast("long").as("p"))
      .collect()
    val tmp = Files.createTempDirectory("pulses")
    rows.groupBy(_.getLong(0)).foreach { case (u, rs) =>
      val qc = if (u % 2 == 0) "QC" else ""
      val body = rs.sortBy(r => (r.getString(1), r.getLong(2)))
        .map(r => s"${r.getString(1)},${r.getLong(2)}").mkString("\n")
      writeFile(tmp, s"site$u.csv",
        s"Site: ${100 + u}\nDatalogger: ${200 + u}\nMeter #${300 + u}$qc\nTime,Pulses\n$body\n")
    }
    totalOrder(CsvIngest.readPulseCsv(spark, tmp.toString)
      .select(col("measurement"), col("siteID"), col("dataloggerID"),
        col("meterID"), col("qc"), col("time"), col("pulses")))
  }

  /** scan_csv_campus + quarantine: a 7-col file (building a), a 4-col file
    * (building b; temps land null via the superset schema), and two
    * malformed lines that must be quarantined, not parsed
    * (transfer_manager.py:87-121; loader.py:48-66). Returns the good rows. */
  def scanCsvCampus(spark: SparkSession, dir: String): DataFrame =
    totalOrder(campusParsed(spark, dir)._1
      .select(col("buildingID"), col("time"), col("coldInFlowRate"),
        col("hotInFlowRate"), col("hotOutFlowRate"), col("hotInTemp"),
        col("hotOutTemp"), col("coldInTemp")))

  /** sink_quarantine: the corrupt-row channel of the same parse. The two
    * malformed lines are fixed strings, so the oracle is a VALUES list. */
  def sinkQuarantine(spark: SparkSession, dir: String): DataFrame =
    totalOrder(campusParsed(spark, dir)._2.select(col("raw_line")))

  private def campusParsed(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val ev = pulseSlice(spark, dir)
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"),
        round(col("value"), 2).as("v"))
      .collect().sortBy(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val tmp = Files.createTempDirectory("campus")
    def lines7(rs: Seq[Row]) = rs.map { r =>
      val v = r.getDouble(2)
      s"${r.getString(1)},$v,${v + 1.0},${v + 2.0},${v + 3.0},${v + 4.0},${v + 5.0}"
    }
    def lines4(rs: Seq[Row]) = rs.map { r =>
      val v = r.getDouble(2)
      s"${r.getString(1)},$v,${v + 1.0},${v + 2.0}"
    }
    val u1 = ev.filter(_.getLong(0) == 1).toSeq
    val u2 = ev.filter(_.getLong(0) == 2).toSeq
    writeFile(tmp, "llc-a_multi_meter.csv",
      "# campus meter export\n" +
        "Date,coldInFlowRate,hotInFlowRate,hotOutFlowRate,hotInTemp,hotOutTemp,coldInTemp\n" +
        lines7(u1).mkString("\n") +
        "\n2024-01-01 00:00:00,not_a_number,1.0,2.0,3.0,4.0,5.0\n" +
        "2024-01-01 00:00:01,1.0,also_bad,2.0,3.0,4.0,5.0\n")
    writeFile(tmp, "llc-b_multi_meter.csv",
      "# campus meter export\n" +
        "Date,coldInFlowRate,hotInFlowRate,hotOutFlowRate\n" +
        lines4(u2).mkString("\n") + "\n")
    CsvIngest.quarantineSplit(CsvIngest.readCampusCsv(spark, tmp.toString))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "scan_csv_pulses" -> scanCsvPulses,
    "scan_csv_campus" -> scanCsvCampus,
    "sink_quarantine" -> sinkQuarantine)

  private val slice =
    """SELECT user_id, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS t,
      |    value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events WHERE user_id BETWEEN 1 AND 3""".stripMargin

  val oracle: Map[String, String] = Map(
    "scan_csv_pulses" ->
      s"""WITH s AS ($slice)
         |SELECT CASE WHEN user_id % 2 = 0 THEN 'QCData' ELSE 'RawData' END
         |    AS measurement,
         |  CAST(100 + user_id AS VARCHAR) AS siteID,
         |  CAST(200 + user_id AS VARCHAR) AS dataloggerID,
         |  CAST(300 + user_id AS VARCHAR) AS meterID,
         |  user_id % 2 = 0 AS qc,
         |  strptime(t, '%Y-%m-%d %H:%M:%S') AS time,
         |  CAST(floor(value) AS BIGINT) AS pulses
         |FROM s WHERE rn <= 50
         |${orderAll("measurement", "siteID", "time", "pulses")}""".stripMargin,
    "scan_csv_campus" ->
      s"""WITH s AS ($slice)
         |SELECT 'A' AS buildingID, strptime(t, '%Y-%m-%d %H:%M:%S') AS time,
         |  round(value, 2) AS coldInFlowRate,
         |  round(value, 2) + 1.0 AS hotInFlowRate,
         |  round(value, 2) + 2.0 AS hotOutFlowRate,
         |  round(value, 2) + 3.0 AS hotInTemp,
         |  round(value, 2) + 4.0 AS hotOutTemp,
         |  round(value, 2) + 5.0 AS coldInTemp
         |FROM s WHERE rn <= 50 AND user_id = 1
         |UNION ALL
         |SELECT 'B', strptime(t, '%Y-%m-%d %H:%M:%S'),
         |  round(value, 2), round(value, 2) + 1.0, round(value, 2) + 2.0,
         |  NULL, NULL, NULL
         |FROM s WHERE rn <= 50 AND user_id = 2
         |${orderAll("buildingID", "time", "coldInFlowRate")}""".stripMargin,
    "sink_quarantine" ->
      s"""SELECT * FROM (VALUES
         |  ('2024-01-01 00:00:00,not_a_number,1.0,2.0,3.0,4.0,5.0'),
         |  ('2024-01-01 00:00:01,1.0,also_bad,2.0,3.0,4.0,5.0'))
         |  AS t(raw_line)
         |${orderAll("raw_line")}""".stripMargin)
}
