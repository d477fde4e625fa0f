package graft

import org.apache.spark.sql.SparkSession

/** Library entry point: one call builds a session with every config the
  * engine needs (nanos-timestamp parquet reads, UTC, AQE, warehouse dir)
  * and the custom Catalyst functions registered — so
  * `SELECT vec_dot(a, b)` and `band_keys(emb)` work from plain SQL too.
  *
  * {{{
  * val spark = Graft.session()                  // local, all cores
  * val store = Graft.store(spark, "/data/tsdb") // measurement store
  * store.influxql("flow", "SELECT mean(value) FROM flow GROUP BY time(1h)")
  * }}}
  *
  * A cluster deployment instead sets
  * `spark.sql.extensions=graft.functions.GraftExtensions` on its own
  * builder and copies [[Tables.sessionConfs]].
  */
object Graft {

  /** Build (or reuse) a configured session. `shufflePartitions` defaults
    * to the core count — the local-mode analog of sizing partitions to
    * cluster parallelism (never leave the 200 default on a laptop or a
    * 32-core driver). */
  def session(
    master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
    appName: String = "graft",
    shufflePartitions: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    functions.GraftFunctions.register(spark)
    spark
  }

  /** A [[graft.store.MeasurementStore]] rooted at `path`. */
  def store(spark: SparkSession, path: String): graft.store.MeasurementStore =
    new graft.store.MeasurementStore(spark, path)
}
