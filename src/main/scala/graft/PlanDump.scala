package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: write `.explain("formatted")` of named queries to files —
  * `sbt "runMain graft.PlanDump <outDir> <sfDir> <q1,q2,...>"`.
  * Not part of the library API. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val dir = args(1)
    val names = args(2).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(out, s"$name.txt"), txt)
      OpCaches.releaseAll(); spark.catalog.clearCache()
    }
    ops.Vectors.releaseIndexes()
    ops.Dedup.releaseBandIndexes()
    spark.stop()
  }
}
