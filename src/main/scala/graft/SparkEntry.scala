package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator id from SURVEY.md §2 to a
  * function running it on the fixture tables in `sfDir`; `oracleSql` gives
  * the DuckDB-executable twin for the hash compare (omitted for ops DuckDB
  * can't express — those get a rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Joins.queries ++ ops.Aggregates.queries ++
      ops.Windows.queries ++ ops.TimeSeries.queries ++ ops.Analytics.queries ++
      ops.Scalars.queries ++
      ops.Text.queries ++ ops.Dedup.queries ++ ops.Vectors.queries ++
      ops.Multimodal.queries ++ ops.Ingest.queries ++ ops.Store.queries ++
      ops.Pipeline.queries ++ ops.InfluxQlOps.queries ++ ops.Admin.queries ++
      streaming.StreamingOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Joins.oracle ++ ops.Aggregates.oracle ++
      ops.Windows.oracle ++ ops.TimeSeries.oracle ++ ops.Analytics.oracle ++
      ops.Scalars.oracle ++
      ops.Text.oracle ++ ops.Dedup.oracle ++ ops.Vectors.oracle ++
      ops.Multimodal.oracle ++ ops.Ingest.oracle ++ ops.Store.oracle ++
      ops.Pipeline.oracle ++ ops.InfluxQlOps.oracle ++ ops.Admin.oracle ++
      streaming.StreamingOps.oracle
}
