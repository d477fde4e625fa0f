package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Window-function surface (SURVEY.md §2.5). One shuffle per distinct
  * (partitionBy, orderBy) — all functions over the same window spec share it,
  * which is the property that keeps these linear at 100 TB. Every orderBy
  * carries a unique-key tail so ranks and frames are deterministic.
  */
object Windows {
  import Relational.{totalOrder, orderAll}

  /** Rank family in one pass: row_number / rank / dense_rank / ntile over a
    * single window spec, top-3 orders per customer. */
  def winRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    totalOrder(load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("quartile", ntile(4).over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rk"), col("drk"), col("quartile")))
  }

  /** Running (cumulative) sum per user in time order — decimal-accumulated
    * so the prefix sums are exact and engine-independent. */
  def winRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totalOrder(load(spark, dir, "events")
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(38, 6))).over(w).cast(DoubleType))
      .select(col("user_id"), col("event_id"), col("ts"), col("running_value")))
  }

  /** lag/lead neighbors per user (the primitive under the pulse-interval
    * transform, get_hot_intake_interval.py:121-147). */
  def winLagLead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    totalOrder(load(spark, dir, "events")
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("next_value", lead(col("value"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("value"),
        col("prev_value"), col("next_value")))
  }

  /** RANGE frame over a numeric order key: sum of order prices within 1000
    * below the current price, per priority class. */
  def winFrameRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
      .rangeBetween(-1000L, 0L)
    // cached: the decimal range-frame window is the final pre-sort stage,
    // which the sort's range-sampling pass would otherwise execute twice
    totalOrder(load(spark, dir, "orders")
      .withColumn("near_sum",
        sum(col("o_totalprice").cast(DecimalType(38, 6))).over(w).cast(DoubleType))
      .withColumn("near_n", count(lit(1)).over(w))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"),
        col("near_sum"), col("near_n"))
      .transform(graft.OpCaches.cached))
  }

  /** Distribution-rank family: percent_rank / cume_dist (frameless) plus
    * nth_value / first_value over an explicit running frame, one window
    * spec each — the relative-standing queries (what percentile is this
    * reading?) the rank family doesn't cover. The unique (value, event_id)
    * order makes every rank tie-free, so the int/int divisions are
    * engine-exact doubles. */
  def winDistRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totalOrder(load(spark, dir, "events")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("third_lowest", nth_value(col("value"), 3).over(wf))
      .withColumn("lowest", first_value(col("value")).over(wf))
      .select(col("event_type"), col("event_id"), col("value"),
        col("pr"), col("cd"), col("third_lowest"), col("lowest")))
  }

  // ----------------------------------------------------------------- wiring

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "win_rank" -> winRank,
    "win_dist_rank" -> winDistRank,
    "win_running_sum" -> winRunningSum,
    "win_lag_lead" -> winLagLead,
    "win_frame_range" -> winFrameRange)

  val oracle: Map[String, String] = Map(
    "win_dist_rank" ->
      s"""SELECT event_type, event_id, value,
         |  PERCENT_RANK() OVER w AS pr,
         |  CUME_DIST() OVER w AS cd,
         |  NTH_VALUE(value, 3) OVER wf AS third_lowest,
         |  FIRST_VALUE(value) OVER wf AS lowest
         |FROM events
         |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id),
         |  wf AS (PARTITION BY event_type ORDER BY value, event_id
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |${orderAll("event_type", "event_id", "value", "pr", "cd",
             "third_lowest", "lowest")}""".stripMargin,
    "win_rank" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk, quartile
         |FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
         |    DENSE_RANK() OVER w AS drk, NTILE(4) OVER w AS quartile
         |  FROM orders
         |  WINDOW w AS (PARTITION BY o_custkey
         |               ORDER BY o_totalprice DESC, o_orderkey))
         |WHERE rn <= 3
         |${orderAll("o_custkey", "o_orderkey", "o_totalprice", "rn", "rk", "drk", "quartile")}""".stripMargin,
    "win_running_sum" ->
      s"""SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
         |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
         |    PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |    AS running_value
         |FROM events
         |${orderAll("user_id", "event_id", "ts", "running_value")}""".stripMargin,
    "win_lag_lead" ->
      s"""SELECT user_id, event_id, value,
         |  LAG(value, 1) OVER w AS prev_value,
         |  LEAD(value, 1) OVER w AS next_value
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         |${orderAll("user_id", "event_id", "value", "prev_value", "next_value")}""".stripMargin,
    "win_frame_range" ->
      s"""SELECT o_orderkey, o_orderpriority, o_totalprice,
         |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS DOUBLE) AS near_sum,
         |  COUNT(*) OVER w AS near_n
         |FROM orders
         |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
         |             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW)
         |${orderAll("o_orderkey", "o_orderpriority", "o_totalprice", "near_sum", "near_n")}""".stripMargin)
}
