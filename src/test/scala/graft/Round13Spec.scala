package graft

import org.apache.spark.sql.functions._

/** Round-13 additions: the streaming ANN index-upsert twin (cross-batch
  * equivalence + split invariance) and the hierarchical two-level quantizer
  * assignment (candidate-set law, flat-argmax containment). */
class Round13Spec extends SparkTestBase {
  import spark.implicits._

  test("stream index upsert: equals the batch twin on the fixture, " +
    "split-invariant with shard members straddling the file split") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    val batch = rows(ops.Vectors.simIndexUpsert(spark, sf))
    assert(batch == rows(streaming.StreamingOps.streamIndexUpsert(spark, sf)))
    // split-invariance under REAL cross-batch appends: the fixture's
    // embeddings split into two files so the upsert shard (vec_id % 10 = 7)
    // straddles the micro-batch boundary — each batch assigns against the
    // same frozen quantizer and appends add-only, so the drained membership
    // must equal the whole-corpus drain exactly
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val emb = Tables.load(spark, sf, "embeddings")
    val mid = emb.agg(percentile_approx(col("vec_id"), lit(0.5), lit(1000)))
      .head().getLong(0)
    def writeSingle(df: org.apache.spark.sql.DataFrame, dest: String): Unit = {
      val tmp = Files.createTempDirectory("upsert_file").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, Paths.get(dest),
        StandardCopyOption.REPLACE_EXISTING)
      ()
    }
    val split = Files.createTempDirectory("upsert_split").toString
    writeSingle(emb.filter(col("vec_id") < mid),
      s"$split/embeddings_1.parquet")
    writeSingle(emb.filter(col("vec_id") >= mid),
      s"$split/embeddings_2.parquet")
    val whole = Files.createTempDirectory("upsert_whole").toString
    writeSingle(emb, s"$whole/embeddings_1.parquet")
    // both halves really carry shard members (the straddle is non-vacuous)
    val loCnt = emb.filter(col("vec_id") < mid
      && ops.Vectors.isUpsertShard(col("vec_id"))).count()
    val hiCnt = emb.filter(col("vec_id") >= mid
      && ops.Vectors.isUpsertShard(col("vec_id"))).count()
    assert(loCnt > 0 && hiCnt > 0, s"degenerate straddle: $loCnt/$hiCnt")
    val splitAudit = rows(streaming.StreamingOps.streamIndexUpsert(
      spark, split, Some(1)))
    assert(splitAudit == rows(streaming.StreamingOps.streamIndexUpsert(
      spark, whole, None)))
    // same data content as the fixture ⇒ same audit as the batch op
    assert(splitAudit == batch)
    ops.Vectors.releaseIndexes()
    OpCaches.releaseAll()
  }

  test("hierarchical assignment: every assigned cell is in the probed " +
    "super's shadow, and matches the flat argmax whenever the flat winner " +
    "is shadow-visible") {
    import graft.functions.GraftFunctions.vecDot
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm",
        sqrt(vecDot(spark, col("embedding"), col("embedding"))))
      .transform(OpCaches.cached)
    // a deterministic small quantizer: every 25th vector as a centroid
    val cents = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("cid"),
        transform(col("embedding"),
          x => x.cast(org.apache.spark.sql.types.DoubleType)).as("cvec"),
        col("nrm").as("cnrm"))
    val hier = ops.Vectors.assignCellsHier(spark, base, cents)
      .as[(Long, Long)].collect().toMap
    val n = base.count()
    assert(hier.size == n, "hierarchical assignment dropped vectors")
    val (sca, shadow) = ops.Vectors.superQuantizer(spark, cents)
    val probes = ops.Vectors.superProbe(spark, base, sca)
      .select("vec_id", "scid").as[(Long, Long)].collect().toMap
    val shadowMap = shadow.select("scid", "cid").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).toSet }
    // candidate-set law: the assigned cell always comes from the probed
    // super's shadow
    hier.foreach { case (v, cid) =>
      assert(shadowMap(probes(v)).contains(cid),
        s"vector $v assigned to $cid outside its probed shadow")
    }
    // containment: where the FLAT argmax winner is visible in the shadow,
    // the hierarchical result must agree (the trade is only ever about
    // out-of-shadow winners)
    val flat = ops.Vectors.assignCells(spark, base, cents)
      .as[(Long, Long)].collect().toMap
    var agreeable = 0
    flat.foreach { case (v, fc) =>
      if (shadowMap(probes(v)).contains(fc)) {
        agreeable += 1
        assert(hier(v) == fc,
          s"vector $v: flat winner $fc shadow-visible but hier chose ${hier(v)}")
      }
    }
    // the law must bite on most of the corpus or the test is vacuous
    assert(agreeable >= n / 2, s"only $agreeable of $n flat winners visible")
    OpCaches.releaseAll()
  }
}
