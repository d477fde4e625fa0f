package graft

import org.apache.spark.sql.functions._

class ScalarsSpec extends SparkTestBase {
  import spark.implicits._

  test("regex extract keeps ids as strings and flags QC") {
    val r = ops.Scalars.strRegexExtract(spark, sf)
      .filter(col("is_qc")).limit(1).collect()
    assert(r.nonEmpty && r(0).getAs[String]("header").endsWith("QC"))
    assert(r(0).getAs[String]("site_id").forall(_.isDigit))
  }

  test("translate drops separators and lowercases") {
    val r = ops.Scalars.strTranslateLower(spark, sf).limit(5).collect()
    r.foreach { row =>
      val k = row.getAs[String]("site_key")
      assert(!k.exists(c => c == ' ' || c == ':' || c == '0' || c.isUpper), k)
    }
  }

  test("iso-z epoch round-trips the timestamp") {
    val bad = ops.Scalars.dateParse(spark, sf)
      .withColumn("rt", to_timestamp(from_unixtime(col("epoch_s"))))
      .filter(col("rt") =!= col("t_parsed")).count()
    assert(bad == 0)
  }

  test("sha256 token is 64 hex chars and deterministic") {
    val t = ops.Scalars.hashSha256(spark, sf).select("token").as[String].head()
    assert(t.length == 64 && t.forall(c => c.isDigit || ('a' to 'f').contains(c)))
  }

  test("norm_sq of unit-ish embeddings is positive and finite") {
    val stats = ops.Scalars.fnArray(spark, sf)
      .agg(min("norm_sq"), max("norm_sq")).head()
    assert(stats.getDouble(0) > 0 && !stats.getDouble(1).isInfinite)
  }

  test("scalar queries stay inside WholeStageCodegen (no UDFs)") {
    val df = ops.Scalars.mathRate(spark, sf)
    df.collect() // materialize THIS plan so AQE finalizes it (count() would plan separately)
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the compact plan string
    assert(plan.contains("*(") && !plan.contains("BatchEvalPython"),
      plan.take(1500))
  }
}
