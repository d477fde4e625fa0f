package graft

import graft.store.VersionedStore
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The versioned store's two contracts the differential gate can't force:
  * optimistic concurrency under a GUARANTEED publish collision, and the
  * vacuum horizon (files really deleted, floor really enforced). */
class StoreVersionSpec extends SparkTestBase {

  private def points(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      (s"site${i % 3}", i.toLong,
        java.sql.Timestamp.valueOf(s"2024-01-0${1 + i % 3} 00:00:${i % 60}"),
        i.toDouble, i.toLong)
    }.toDF("tag", "seq", "time", "value", "version")
  }

  test("forced commit collision: loser rebases, both revisions land") {
    val root = Files.createTempDirectory("vs_occ").toString
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val vs = new VersionedStore(spark, root) {
      override protected def beforeCommit(t: String, v: Long): Unit =
        // only the two racing upserts (targeting version 1) are barriered;
        // await twice total, so both writers hold the SAME base snapshot
        // when they publish — one MUST lose
        if (v == 1L) { gate.await(30, java.util.concurrent.TimeUnit.SECONDS); () }
    }
    vs.append("m", points(30))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val keys = Seq("tag", "seq", "time")
    def rev(day: String, bump: Long) = points(30)
      .filter(date_format(col("time"), "yyyy-MM-dd") === day)
      .withColumn("value", col("value") + 1000)
      .withColumn("version", col("version") + bump)
    try {
      val a = Future(vs.upsert("m", rev("2024-01-01", 10), keys, "version"))
      val b = Future(vs.upsert("m", rev("2024-01-02", 20), keys, "version"))
      val (va, vb) = Await.result(a.zip(b), 2.minutes)
      assert(Set(va, vb) == Set(1L, 2L), s"versions $va/$vb not linear")
    } finally pool.shutdown()
    assert(vs.occConflicts >= 1, "the barrier guaranteed a lost race")
    assert(vs.history("m").map(_._1) == Seq(0L, 1L, 2L))
    // both disjoint-day revisions survived whichever writer rebased
    val bumped = vs.read("m").filter(col("value") >= 1000)
      .select(date_format(col("time"), "yyyy-MM-dd")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(bumped == Set("2024-01-01", "2024-01-02"))
    assert(vs.read("m").count() == 30)
  }

  test("concurrent blind appends: no lost rows, no double-publish") {
    val root = Files.createTempDirectory("vs_app").toString
    val vs = new VersionedStore(spark, root)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = (0 until 4).map(i =>
        Future(vs.append("m", points(10).withColumn("seq",
          col("seq") + lit(i * 100)))))
      Await.result(Future.sequence(fs), 2.minutes)
      ()
    } finally pool.shutdown()
    assert(vs.latestVersion("m") == 3L)
    assert(vs.read("m").count() == 40)
  }

  test("time travel reads are snapshot-exact and torn never") {
    val root = Files.createTempDirectory("vs_tt").toString
    val vs = new VersionedStore(spark, root)
    vs.append("m", points(10))
    vs.append("m", points(10).withColumn("seq", col("seq") + 100))
    vs.upsert("m", points(10).withColumn("value", col("value") * 2)
      .withColumn("version", col("version") + 50),
      Seq("tag", "seq", "time"), "version")
    assert(vs.readAsOf("m", 0).count() == 10)
    assert(vs.readAsOf("m", 1).count() == 20)
    assert(vs.read("m").count() == 20)
    // v2 doubled the first batch's values; v1 must still see the originals
    assert(vs.readAsOf("m", 1).filter(col("seq") < 100)
      .agg(sum("value")).head.getDouble(0) == 45.0)
    assert(vs.readAsOf("m", 2).filter(col("seq") < 100)
      .agg(sum("value")).head.getDouble(0) == 90.0)
    intercept[IllegalArgumentException] { vs.readAsOf("m", 3) }
    intercept[IllegalArgumentException] { vs.readAsOf("m", -1) }
  }

  test("vacuum deletes only unreferenced files and raises the floor") {
    val root = Files.createTempDirectory("vs_vac").toString
    val vs = new VersionedStore(spark, root)
    vs.append("m", points(10))
    vs.upsert("m", points(10).withColumn("value", col("value") + 1)
      .withColumn("version", col("version") + 50),
      Seq("tag", "seq", "time"), "version") // v1 rewrites every day
    vs.append("m", points(5).withColumn("seq", col("seq") + 200)) // v2
    val before = vs.read("m").collect().toSet
    val deleted = vs.vacuum("m", retainLast = 2) // keep v1, v2
    assert(deleted.nonEmpty, "v0's superseded files were unreferenced")
    deleted.foreach { rel =>
      assert(!Files.exists(java.nio.file.Paths.get(s"$root/m/data/$rel")),
        s"$rel still on disk")
    }
    assert(vs.readFloor("m") >= 1L)
    intercept[IllegalArgumentException] { vs.readAsOf("m", 0) }
    assert(vs.readAsOf("m", 1).count() == 10)
    assert(vs.read("m").collect().toSet == before,
      "vacuum changed the current snapshot")
  }
}
