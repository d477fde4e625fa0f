package graft
import org.apache.spark.sql.SparkSession
/** Dev scratch main: time any query at any SF —
  * `sbt "runMain graft.Scratch <sfDir> <query1,query2,...>"`.
  * Not part of the library API. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
      val n = df.count()
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  $n%8d rows")
    }
    spark.stop()
  }
}
