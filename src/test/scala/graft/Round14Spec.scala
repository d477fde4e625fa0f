package graft

import org.apache.spark.sql.functions._

/** Round-14 additions: the index-retrain response (version-snapshot
  * isolation, post-retrain search ≡ in-memory union search, and the
  * sub-threshold no-op path) and the occupancy-capped SemDeDup pair
  * stage (slab containment bound on the generator's pair mass). */
class Round14Spec extends SparkTestBase {
  import spark.implicits._

  private def rmrf(path: String): Unit = {
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(); ()
    }
    rm(new java.io.File(path))
  }

  private def listSnapshot(dir: String): Map[String, (Long, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
      .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
  }

  test("index retrain: v1 byte-untouched, new version's search equals " +
    "the in-memory union search, decision columns exact") {
    import graft.functions.GraftFunctions.vecDot
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm",
        sqrt(vecDot(spark, col("embedding"), col("embedding"))))
      .transform(OpCaches.cached)
    val v1 = java.nio.file.Files.createTempDirectory("retrain_v1").toString
    val v2Key = v1 + "#spec_retrain"
    try {
      ops.Vectors.upsertIndexBuild(spark, base, v1)
      ops.Vectors.upsertIndexAppend(spark, base, v1)
      val before = listSnapshot(v1)
      val audit = ops.Vectors.retrainIndex(spark, v1, base, v2Key)
        .collect()
      // the fixture shard is ~11% — above the 5% threshold, so a new
      // version must have been cut and v1 must be byte-identical
      assert(audit.forall(_.getAs[Boolean]("retrained")))
      assert(listSnapshot(v1) == before,
        "retrain touched the serving (v1) index")
      val nb = base.filter(!ops.Vectors.isUpsertShard(col("vec_id"))).count()
      val nu = base.filter(ops.Vectors.isUpsertShard(col("vec_id"))).count()
      assert(audit.head.getAs[Long]("old_n_base") == nb)
      assert(audit.head.getAs[Long]("old_n_upserted") == nu)
      assert(audit.head.getAs[Double]("drift") == nu.toDouble / nb)
      // the audited cells are the NEW version's: total membership is the
      // whole union corpus, all generation 0 on disk
      assert(audit.map(_.getAs[Long]("n_vecs")).sum == nb + nu)
      // post-retrain search ≡ the same search over an in-memory retrain of
      // the union corpus (doubles round-trip parquet exactly)
      val v2 = ops.Vectors.indexDirFor(v2Key).get
      val cents2 = spark.read.parquet(s"$v2/centroids")
      val lists2 = spark.read.parquet(s"$v2/lists")
        .withColumn("cid", col("cid").cast("long"))
      assert(lists2.filter(col("gen") =!= 0L).count() == 0L,
        "new version carries non-zero generations")
      def search(centsDf: org.apache.spark.sql.DataFrame,
          listsDf: org.apache.spark.sql.DataFrame) = {
        val queries = base.filter(ops.Vectors.isQuery(col("vec_id")))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_nrm"))
        val wProbe = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("qc").desc, col("cid"))
        val probes = queries.crossJoin(broadcast(centsDf))
          .withColumn("qc", vecDot(spark, col("q_emb"), col("cvec"))
            / (col("q_nrm") * col("cnrm")))
          .withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= 2)
          .select(col("q_id"), col("q_emb"), col("q_nrm"), col("cid"))
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
        probes.join(listsDf.select("vec_id", "cid"), "cid")
          .join(base, "vec_id")
          .filter(col("vec_id") =!= col("q_id"))
          .withColumn("cosine", vecDot(spark, col("embedding"), col("q_emb"))
            / (col("nrm") * col("q_nrm")))
          .withColumn("rk", row_number().over(wRank))
          .filter(col("rk") <= 5)
          .select(col("q_id"), col("vec_id"), col("rk"))
          .as[(Long, Long, Int)].collect().toSet
      }
      val (c2m, listsM) = ops.Vectors.ivfIndex(spark, base)
      val fromDisk = search(cents2, lists2)
      assert(fromDisk.nonEmpty && fromDisk == search(c2m, listsM))
    } finally {
      rmrf(v1)
      ops.Vectors.releaseIndexes()
      OpCaches.releaseAll()
    }
  }

  test("index retrain: a sub-threshold shard cuts no new version and " +
    "audits the live v1 index, both generations included") {
    import graft.functions.GraftFunctions.vecDot
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm",
        sqrt(vecDot(spark, col("embedding"), col("embedding"))))
      .transform(OpCaches.cached)
    // synthetic 2% shard: vec_id ≡ 0 (mod 50) plays the upsert batch
    val tiny = col("vec_id") % 50 === 0
    val v1 = java.nio.file.Files.createTempDirectory("retrain_small").toString
    val v2Key = v1 + "#spec_noop"
    try {
      val old = base.filter(!tiny)
      val (c2, lists) = ops.Vectors.ivfIndex(spark, old)
      c2.select(col("cid"), col("cvec"), col("cnrm"))
        .coalesce(1).write.mode("overwrite").parquet(s"$v1/centroids")
      lists.withColumn("gen", lit(0L))
        .write.mode("overwrite").partitionBy("cid").parquet(s"$v1/lists")
      val cents = spark.read.parquet(s"$v1/centroids")
      ops.Vectors.assignCellsGated(spark, base.filter(tiny), cents,
        cents.count())
        .withColumn("gen", lit(1L))
        .write.mode("append").partitionBy("cid").parquet(s"$v1/lists")
      val audit = ops.Vectors.retrainIndex(spark, v1, base, v2Key).collect()
      assert(audit.forall(!_.getAs[Boolean]("retrained")))
      assert(audit.head.getAs[Double]("drift") < ops.Vectors.RetrainMinDrift)
      // no new version registered, and the audit covers BOTH generations
      // of the still-live v1
      assert(ops.Vectors.indexDirFor(v2Key).isEmpty,
        "sub-threshold drift still cut a new index version")
      assert(audit.map(_.getAs[Long]("n_vecs")).sum == base.count())
    } finally {
      rmrf(v1)
      ops.Vectors.releaseIndexes()
      OpCaches.releaseAll()
    }
  }

  test("capped SemDeDup generator: pairs stay within sub-split slabs and " +
    "are exactly the τ-pairs of those slabs") {
    import graft.functions.GraftFunctions.vecDot
    // reproduce the generator's own blocking frames and check containment:
    // every emitted pair shares (cid, sub); every within-slab τ-pair is
    // emitted (no silent extra cap)
    val (lists, pairsDf) = ops.Vectors.semanticPairGraph(spark, sf)
    val pairs = pairsDf.as[(Long, Long)].collect().toSet
    assert(pairs.nonEmpty, "fixture generated no semantic pairs")
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm",
        sqrt(vecDot(spark, col("embedding"), col("embedding"))))
      .transform(OpCaches.cached)
    val cells = ops.Vectors.subSplit(spark, lists, base)
      .as[(Long, Long, Long)].collect()
      .map { case (v, c, s) => v -> ((c, s)) }.toMap
    pairs.foreach { case (a, b) =>
      assert(cells(a) == cells(b),
        s"pair ($a,$b) straddles slabs ${cells(a)} vs ${cells(b)}")
    }
    // exhaustive within-slab truth on the (small) fixture
    val emb = base.select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)].collect()
      .map { case (v, e, n) => v -> ((e, n)) }.toMap
    val bySlab = cells.toSeq.groupBy(_._2).values
    val truth = bySlab.flatMap { members =>
      val ids = members.map(_._1).sorted
      for {
        i <- ids.indices; j <- (i + 1) until ids.size
        (ea, na) = emb(ids(i)); (eb, nb) = emb(ids(j))
        dot = ea.zip(eb).map { case (x, y) => x.toDouble * y.toDouble }.sum
        if dot / (na * nb) >= 0.45
      } yield (ids(i), ids(j))
    }.toSet
    assert(pairs == truth)
    OpCaches.releaseAll()
  }
}
