package graft

import org.apache.spark.sql.functions._

/** Specs for the non-oracle extension paths: MinHash/SimHash (engine-hash
  * based, so DuckDB can't mirror them) and the mapPartitions decode stub. */
class ExtensionSpec extends SparkTestBase {
  import spark.implicits._

  lazy val exactPairs: Set[(Long, Long)] =
    ops.Dedup.dedupNgramJaccard(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  lazy val minhashPairs: Set[(Long, Long)] =
    ops.Dedup.dedupMinhash(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet

  test("minhash pairs are exact-verified (precision 1.0)") {
    // every emitted pair passed the exact-Jaccard verification step
    assert(minhashPairs.subsetOf(exactPairs),
      s"false positives: ${minhashPairs -- exactPairs}")
  }

  test("minhash recall on planted near-dups") {
    // fixture has planted near-dups with jaccard ~0.99; at j>=0.3 and
    // 4 bands x 4 rows, P[candidate] = 1-(1-j^4)^4 is ~1 for j>0.7 —
    // require we find at least the high-similarity pairs
    val high = ops.Dedup.dedupNgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val missed = high -- minhashPairs
    assert(missed.isEmpty, s"missed high-jaccard pairs: $missed")
  }

  test("simhash pairs: subset of exact jaccard pairs, full recall on " +
    "near-identical docs") {
    val sh = ops.Dedup.dedupSimhashPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sh.nonEmpty, "no simhash pairs found")
    // precision: hamming<=3 over shingle features implies high overlap, so
    // every pair must also pass the exact jaccard>=0.3 gate
    assert(sh.subsetOf(exactPairs), s"false positives: ${sh -- exactPairs}")
    // recall: near-identical docs with SUBSTANTIAL shingle sets — simhash
    // majority votes are noisy for short docs (few elements => thin vote
    // margins => high hamming even at j~0.95; measured: n_sh<30 pairs land
    // at hamming 7-10), so the sketch's contract is long-document dedup
    val high = ops.Dedup.dedupNgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.95 && col("inter") >= 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(high.nonEmpty, "recall set empty — fixture drifted")
    val missed = high -- sh
    assert(missed.isEmpty, s"missed near-identical pairs: $missed")
  }

  test("simhash is deterministic and 60-bit") {
    val a = ops.Dedup.dedupSimhash(spark, sf)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val b = ops.Dedup.dedupSimhash(spark, sf)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(a == b)
    // md5w token hashes carry 60 bits, so bits 60-63 of the majority
    // vote are constant 0 — the signature is a nonneg long
    assert(a.values.forall(v => v >= 0L && (v >> 60) == 0L),
      "bits 60-63 must be clear")
  }

  test("exact dedup groups hold identical normalized text") {
    val dups = ops.Dedup.dedupExact(spark, sf)
    // every reported group really has n>=2 members with one hash
    assert(dups.filter(col("n_dups") < 2).count() == 0)
  }

  test("multimodal clusters: union graph coarsens both pair sets") {
    val mm = ops.Dedup.dedupMultimodalClusters(spark, sf)
      .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap
    // every TEXT near-dup pair lands in one cluster
    val tp = ops.Dedup.dedupNgramJaccard(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    tp.foreach { case (a, b) =>
      assert(mm(a) == mm(b), s"text pair ($a,$b) split across clusters")
    }
    // every SEMANTIC near-dup pair lands in one cluster
    val ep = ops.Dedup.dedupEmbcos(spark, sf)
      .select("canonical_id", "dup_id").as[(Long, Long)].collect()
    ep.foreach { case (a, b) =>
      assert(mm(a) == mm(b), s"embedding pair ($a,$b) split across clusters")
    }
    // participants are exactly the union of both graphs' nodes
    val want = (tp.flatMap(p => Seq(p._1, p._2)) ++
      ep.flatMap(p => Seq(p._1, p._2))).toSet
    assert(mm.keySet == want)
    // one survivor per cluster, and it is the smallest id
    val bySurv = mm.groupBy(_._2)
    bySurv.foreach { case (canon, members) =>
      assert(members.keys.min == canon)
    }
  }

  test("paragraph dedup: repeated spans strip atomically across docs") {
    val out = ops.Dedup.dedupParagraph(spark, sf)
    // the fixture's duplicated documents share spans, so something drops
    assert(out.filter(col("n_dropped") > 0).count() > 0)
    // bookkeeping invariant per doc
    assert(out.filter(col("n_kept") + col("n_dropped") =!= col("n_spans"))
      .count() == 0)
    // a doc with nothing dropped rebuilds its exact normalized text:
    // clean_md5 == md5 of the whitespace-normalized original
    val norm = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), md5(concat_ws("\n\n",
        filter(transform(split(col("text"), "\n{2,}"),
            p => array_join(filter(split(p, "\\s+"), t => t =!= ""), " ")),
          p => p =!= ""))).as("norm_md5"))
    val joined = out.filter(col("n_dropped") === 0).join(norm, "doc_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("clean_md5") =!= col("norm_md5")).count() == 0)
    // the stats histogram accounts for every span instance, and the
    // cross-doc (df>1) instances are EXACTLY the dropped ones
    val stats = ops.Dedup.dedupSpanStats(spark, sf)
    assert(stats.agg(sum("n_occurrences")).head.getLong(0)
      == out.agg(sum("n_spans")).head.getLong(0))
    assert(stats.filter(col("n_docs") > 1)
      .agg(coalesce(sum("n_occurrences"), lit(0L))).head.getLong(0)
      == out.agg(sum("n_dropped")).head.getLong(0))
  }

  test("knn: rank 1 neighbor has the max cosine; no self matches") {
    val knn = ops.Vectors.simKnnBruteforce(spark, sf)
    assert(knn.filter(col("q_id") === col("neighbor_id")).count() == 0)
    val perQ = knn.groupBy("q_id")
      .agg(max(when(col("rk") === 1, col("cosine"))).as("r1"),
        max(col("cosine")).as("mx"))
    assert(perQ.filter(col("r1") =!= col("mx")).count() == 0)
  }

  test("ivf knn: valid structure and nontrivial recall vs brute force") {
    val ivf = ops.Vectors.simKnnIvf(spark, sf)
    assert(ivf.filter(col("q_id") === col("neighbor_id")).count() == 0)
    // exactly 5 ranked neighbors per query
    val counts = ivf.groupBy("q_id").count().select("count")
      .as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    val bf = ops.Vectors.simKnnBruteforce(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val iv = ivf.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = iv.intersect(bf).size.toDouble / bf.size
    // random near-orthogonal vectors are IVF's worst case; nprobe=2 of 10
    // lists still has to beat a trivial floor
    assert(recall >= 0.1, s"recall@5 = $recall")
  }

  test("sq8 knn: high recall vs brute force — int8 rounding noise stays " +
    "inside the 32-wide exact re-rank") {
    val sq = ops.Vectors.simKnnSq8(spark, sf)
    assert(sq.filter(col("q_id") === col("neighbor_id")).count() == 0)
    val counts = sq.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    val bf = ops.Vectors.simKnnBruteforce(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = sq.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    // scalar quantization preserves far more of the dot product than IVF's
    // list pruning — the candidate stage alone should recover nearly all
    // true top-5 neighbors
    assert(recall >= 0.8, s"sq8 recall@5 = $recall")
  }

  test("mrl knn: prefix-truncated candidates still recover most of the " +
    "exact top-5 after the full-dimension re-rank") {
    val mrl = ops.Vectors.simKnnMrl(spark, sf)
    val counts = mrl.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    val bf = ops.Vectors.simKnnBruteforce(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = mrl.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    // the fixture's embeddings are NOT Matryoshka-trained, so a 16-dim
    // prefix is only a random coordinate subset — the honest floor is
    // modest (measured 0.28 here) but ~4× above the 32/n≈0.06 chance
    // floor; MRL-trained vectors are where the tier earns its recall
    assert(recall >= 0.2, s"mrl recall@5 = $recall")
  }

  test("pipeline_sample_weighted: membership is exactly the integer hash " +
    "law, reproducible across runs") {
    val got = ops.Pipeline.pipelineSampleWeighted(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val w = ops.Pipeline.SampleWeights.toMap
    val expected = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").as[(Long, String)].collect()
      .filter { case (id, s) =>
        val u = (id * 2654435761L) % 4294967296L
        u * 1000L < w(s) * 4294967296L
      }.map(_._1).toSet
    assert(got === expected)
    // determinism: a second run yields the identical sample
    val again = ops.Pipeline.pipelineSampleWeighted(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(again === got)
  }

  test("as-of directions: forward/nearest agree with backward on " +
    "coincident instants and bracket every click") {
    import org.apache.spark.sql.Row
    val back = ops.Joins.joinAsof(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Timestamp]("last_view_ts")).toMap
    val fwd = ops.Joins.joinAsofForward(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Timestamp]("next_view_ts")).toMap
    val near = ops.Joins.joinAsofNearest(spark, sf).collect()
    assert(near.nonEmpty)
    near.foreach { r =>
      val id = r.getLong(0)
      val ts = r.getAs[java.sql.Timestamp]("ts")
      val nv = r.getAs[java.sql.Timestamp]("nearest_view_ts")
      val side = r.getAs[String]("side")
      val (p, n) = (back(id), fwd(id))
      // the nearest match IS one of the two directional matches, and it
      // is the closer one (ties to prev)
      side match {
        case "prev" => assert(nv == p && (n == null ||
          ts.getTime - p.getTime <= n.getTime - ts.getTime))
        case "next" => assert(nv == n && (p == null ||
          n.getTime - ts.getTime < ts.getTime - p.getTime))
        case "none" => assert(p == null && n == null && nv == null)
      }
      // bracketing: prev <= click <= next whenever they exist
      if (p != null) assert(!p.after(ts))
      if (n != null) assert(!n.before(ts))
    }
  }

  test("persisted ivf index: cold read-back search is bit-identical to " +
    "the in-memory tier; lists land cid-partitioned on disk") {
    import graft.functions.GraftFunctions.vecDot
    val mem = ops.Vectors.simKnnIvf(spark, sf)
      .select("q_id", "neighbor_id", "rk", "cosine")
      .as[(Long, Long, Int, Double)].collect().sorted
    OpCaches.releaseAll(); spark.catalog.clearCache()
    val idx = ops.Vectors.simKnnIndexed(spark, sf)
      .select("q_id", "neighbor_id", "rk", "cosine")
      .as[(Long, Long, Int, Double)].collect().sorted
    // EXACT equality including every cosine double: the index round-trips
    // through parquet bit-for-bit, so cold search == in-memory search
    assert(idx.sameElements(mem))
    // the on-disk layout is the list-pruning contract: one directory per
    // cell, so a probed search's scan touches only its cells' files
    val out = java.nio.file.Files.createTempDirectory("ivf_layout").toString
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(vecDot(spark, col("embedding"), col("embedding"))))
    ops.Vectors.ivfIndexWrite(spark, base, out)
    val cellDirs = new java.io.File(s"$out/lists").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cid="))
    val cells = ops.Vectors.simIndexBuild(spark, sf)
      .select("cid").as[Long].collect()
    assert(cellDirs.length == cells.length && cellDirs.nonEmpty)
    assert(cellDirs.map(_.getName.stripPrefix("cid=").toLong).sorted
      .sameElements(cells.sorted))
    OpCaches.releaseAll()
  }

  test("ivf index lifecycle: one build per session for both index ops, " +
    "release deletes the persisted copy") {
    // start from a clean registry so the count observes THIS pair
    ops.Vectors.releaseIndexes()
    val before = ops.Vectors.ivfBuildCount
    ops.Vectors.simIndexBuild(spark, sf).collect()
    val dir = ops.Vectors.ensureIvfIndex(spark, sf,
      fail("reuse path must not re-evaluate the training frame"))
    ops.Vectors.simKnnIndexed(spark, sf).collect()
    // build-once/query-many for real: the second op (and the probe above)
    // reused the first op's persisted index instead of retraining
    assert(ops.Vectors.ivfBuildCount == before + 1)
    assert(new java.io.File(s"$dir/lists").isDirectory)
    ops.Vectors.releaseIndexes()
    assert(!new java.io.File(dir).exists(),
      s"release left the persisted index behind: $dir")
    OpCaches.releaseAll()
  }

  test("index upsert: old list files byte-untouched, only the shard " +
    "appended, post-upsert search equals the in-memory union search") {
    import graft.functions.GraftFunctions.vecDot
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm",
        sqrt(vecDot(spark, col("embedding"), col("embedding"))))
      .transform(OpCaches.cached)
    val out = java.nio.file.Files.createTempDirectory("upsert_spec").toString
    def snapshot(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(new java.io.File(s"$out/lists")).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
    }
    try {
      ops.Vectors.upsertIndexBuild(spark, base, out)
      val before = snapshot()
      assert(before.nonEmpty, "base build wrote no list files")
      ops.Vectors.upsertIndexAppend(spark, base, out)
      val after = snapshot()
      // incrementality for real: every pre-existing file survives with the
      // same bytes (size + mtime), the append only ADDED files
      before.foreach { case (path, meta) =>
        assert(after.get(path).contains(meta),
          s"append rewrote a base list file: $path")
      }
      assert(after.size > before.size, "append added no list files")
      // the upserted rows are exactly the shard, tagged gen=1
      val lists = spark.read.parquet(s"$out/lists")
        .withColumn("cid", col("cid").cast("long"))
      val shardIds = base.filter(ops.Vectors.isUpsertShard(col("vec_id")))
        .select("vec_id").as[Long].collect().toSet
      val gen1 = lists.filter(col("gen") === 1L)
        .select("vec_id").as[Long].collect().toSet
      assert(gen1 == shardIds)
      // search equality: the nprobe=2 search over the POST-UPSERT persisted
      // index equals the same search over in-memory frames of the union
      // corpus under the same (frozen, pre-shard-trained) quantizer —
      // doubles round-trip parquet exactly, so these are identical SETS
      val cents = spark.read.parquet(s"$out/centroids")
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
      val fromDisk = search(cents, lists)
      // in-memory twin: same frozen quantizer, but the cell MEMBERSHIP of
      // the union corpus recomputed from scratch (the GATED assignment —
      // the same path build + append ride), never read from disk —
      // equality proves build + append together produced exactly the
      // assignment a one-shot job over the union would
      val fresh = search(cents,
        ops.Vectors.assignCellsGated(spark, base, cents, cents.count()))
      assert(fromDisk.nonEmpty && fromDisk == fresh)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(); ()
      }
      rm(new java.io.File(out))
      OpCaches.releaseAll()
    }
  }

  test("knn self-join: co-celled pairs only, contiguous ranks, " +
    "nontrivial recall vs exact all-pairs top-3") {
    val kj = ops.Vectors.simKnnJoin(spark, sf)
    assert(kj.filter(col("q_id") === col("neighbor_id")).count() == 0)
    // ranks are contiguous from 1 and cosine is non-increasing in rank
    val byQ = kj.select("q_id", "rk", "cosine")
      .as[(Long, Int, Double)].collect().groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 >= b._3; case _ => true })
    }
    // near-all coverage: only vectors alone in their cell emit nothing
    val n = Tables.load(spark, sf, "embeddings").count()
    assert(byQ.size >= n / 2, s"only ${byQ.size} of $n vectors got neighbors")
    // recall vs the exact all-pairs top-3 (cell-restricted nprobe=1 search
    // over near-orthogonal random vectors — must beat a trivial floor)
    import graft.functions.GraftFunctions.vecDot
    val base = Tables.load(spark, sf, "embeddings")
      .withColumn("nrm", sqrt(vecDot(spark, col("embedding"), col("embedding"))))
    val b2 = base.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cosine").desc, col("n_id"))
    val exact = base.crossJoin(b2).filter(col("vec_id") =!= col("n_id"))
      .withColumn("cosine",
        vecDot(spark, col("embedding"), col("n_emb")) / (col("nrm") * col("n_nrm")))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("vec_id"), col("n_id")).as[(Long, Long)].collect().toSet
    val got = kj.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.1, s"recall@3 = $recall")
    OpCaches.releaseAll()
  }

  test("pq knn: valid structure and nontrivial recall vs brute force") {
    val pq = ops.Vectors.simKnnPq(spark, sf)
    assert(pq.filter(col("q_id") === col("neighbor_id")).count() == 0)
    val counts = pq.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    val bf = ops.Vectors.simKnnBruteforce(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = pq.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    // 4×16-dim codebooks over random near-orthogonal vectors are PQ's worst
    // case; ADC + exact re-rank of 20 must still beat a trivial floor
    assert(recall >= 0.1, s"recall@5 = $recall")
  }

  test("ivf-pq knn: candidates respect the probed lists, recall >= ivf's") {
    val ivfpq = ops.Vectors.simKnnIvfPq(spark, sf)
    assert(ivfpq.filter(col("q_id") === col("neighbor_id")).count() == 0)
    val counts = ivfpq.groupBy("q_id").count().select("count")
      .as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    val bf = ops.Vectors.simKnnBruteforce(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "neighbor_id").as[(Long, Long)]
        .collect().toSet
      got.intersect(bf).size.toDouble / bf.size
    }
    val rIvf = recallOf(ops.Vectors.simKnnIvf(spark, sf))
    val rIvfPq = recallOf(ivfpq)
    // the composed tier prunes with the SAME lists, then ADC-ranks within
    // them with exact re-rank of 20 — on this fixture the IVF tier's exact
    // within-list scan is the ceiling, and the PQ approximation must not
    // fall off a cliff below it
    assert(rIvfPq >= 0.1, s"recall@5 = $rIvfPq")
    assert(rIvfPq >= rIvf - 0.25,
      s"ivfpq recall $rIvfPq collapsed vs ivf $rIvf")
    OpCaches.releaseAll()
  }

  test("rp knn: valid structure and strong recall vs brute force") {
    val rp = ops.Vectors.simKnnRp(spark, sf)
    assert(rp.filter(col("q_id") === col("neighbor_id")).count() == 0)
    val counts = rp.groupBy("q_id").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 5L))
    val bf = ops.Vectors.simKnnBruteforce(spark, sf)
      .select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = rp.select("q_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = got.intersect(bf).size.toDouble / bf.size
    // random near-orthogonal vectors are JL's worst case (the top-5 gap
    // is comparable to the 1/√k projection noise); the pool must still
    // carry far more of the true top-5 than a random 32-of-n pool would
    // (~0.05 here), and the family's trivial floor applies
    assert(recall >= 0.1, s"recall@5 = $recall")
    OpCaches.releaseAll()
  }

  test("ivf stats: audit reconciles with the corpus and bounds the self-join") {
    val r = ops.Vectors.simIvfStats(spark, sf).head()
    val (nCells, minSz, maxSz, avgSz, skew, mass) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5))
    val (nCellsSub, maxSzSub, massSub) =
      (r.getAs[Long]("n_cells_sub"), r.getAs[Long]("max_sz_sub"),
        r.getAs[Long]("join_mass_sub"))
    val n = Tables.load(spark, sf, "embeddings").count()
    // every vector lands in exactly one cell
    assert(math.abs(avgSz * nCells - n) < 1e-6)
    assert(minSz >= 1 && minSz <= maxSz)
    assert(skew >= 1.0 && math.abs(skew - maxSz / avgSz) < 1e-9)
    // join mass brackets: n ≤ Σsz² ≤ n·max (the simKnnJoin cost envelope)
    assert(mass >= n && mass <= n * maxSz)
    // the sub-split's LINEAR-mass invariant: k2 = max(1, round(g/cap))
    // keeps every slab at ≤ ⌈3/2·cap⌉ members (worst case g = 1.5·cap − ε
    // with k2 = 1), so join_mass_sub ≤ n · ⌈3/2·cap⌉ — at ANY corpus
    // size, with NO dependence on the raw cell sizes (the round-12 advice:
    // the old max(slabCap, maxSz) escape made this assert vacuous)
    val slabCap = math.ceil(1.5 * ops.Vectors.JoinCellCap).toLong
    assert(nCellsSub >= nCells)
    assert(maxSzSub <= slabCap,
      s"slab of $maxSzSub exceeds the occupancy bound $slabCap")
    assert(massSub <= mass && massSub <= n * slabCap)
    // the assignment audit prices the PATH THE GATE TAKES: below HierMinK
    // trained centroids the flat n×k pass runs and assign_mass must equal
    // it exactly; at or above, the two-level count must beat it. The super
    // tier is structural either way (≈√k supers, strictly fewer than cells)
    val (nSupers, assignMass) =
      (r.getAs[Long]("n_supers"), r.getAs[Long]("assign_mass"))
    assert(nSupers >= 1 && nSupers < nCells)
    if (nCells < ops.Vectors.HierMinK)
      assert(assignMass == nCells * n,
        s"flat-path assign_mass ($assignMass) must equal n_cells*n " +
          s"(${nCells * n})")
    else {
      assert(assignMass >= 2 * n, "every vector pays ≥1 probe + ≥1 candidate")
      assert(assignMass < nCells * n,
        s"hierarchical assignment ($assignMass dots) did not beat the flat " +
          s"pass (${nCells * n})")
    }
    OpCaches.releaseAll()
  }

  test("sub-split: exact rank balance, spatial slab order, linear mass " +
    "on an oversized cell") {
    import graft.functions.GraftFunctions.vecDot
    // force ONE oversized cell: every fixture vector assigned to cid 0 —
    // the split must carve it into round(n/64) balanced projection slabs
    val base = Tables.load(spark, sf, "embeddings")
    val lists = base.select(col("vec_id"), lit(0L).as("cid"))
    val cells = ops.Vectors.subSplit(spark, lists, base)
    val n = base.count()
    val k2 = math.max(1L, math.round(n / 64.0))
    val sizes = cells.groupBy("sub").count()
      .select("sub", "count").as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (0L until k2).toSet)
    // rank-chunking makes balance EXACT: sizes differ by at most 1
    assert(sizes.values.max - sizes.values.min <= 1,
      s"unbalanced slabs: $sizes")
    // slabs are projection-ORDERED: every member of slab i projects at or
    // below every member of slab i+1 (ties broken by vec_id inside the
    // window, so compare strictly across distinct projections)
    val plane = typedlit(Array.tabulate(ops.SignLsh.Dim)(d =>
      ops.SignLsh.weight(0, d).toFloat))
    val projs = cells.join(base, "vec_id")
      .select(col("sub"), vecDot(spark, col("embedding"), plane).as("p"))
      .as[(Long, Double)].collect()
    val bySlab = projs.groupBy(_._1).map { case (s, xs) =>
      s -> (xs.map(_._2).min, xs.map(_._2).max) }
    (0L until k2 - 1).foreach { s =>
      assert(bySlab(s)._2 <= bySlab(s + 1)._1 + 1e-12,
        s"slab $s overlaps slab ${s + 1} in projection space")
    }
    OpCaches.releaseAll()
  }

  test("lsh pairs are a subset of all >=0.4 cosine pairs and nonempty") {
    val n = ops.Vectors.simCosineLsh(spark, sf).count()
    assert(n > 0, "expected some near pairs at threshold 0.4")
    val bad = ops.Vectors.simCosineLsh(spark, sf)
      .filter(col("cosine") < 0.4).count()
    assert(bad == 0)
  }

  test("png decode: exact round-trip fidelity, deterministic features") {
    // codec law: decode(encode(bytes)) recovers the cyclic pixel pattern
    val bytes = "the quick brown fox".getBytes("UTF-8")
    val (w, h, px) = ops.MultimodalLib.decodePng(
      ops.MultimodalLib.encodePng(bytes))
    assert(w == ops.MultimodalLib.Side && h == ops.MultimodalLib.Side)
    px.zipWithIndex.foreach { case (v, i) =>
      assert(v == (bytes(i % bytes.length) & 0xff) / 255.0,
        s"pixel $i corrupted by the codec round-trip")
    }
    // pipeline: deterministic, partition-count independent, sane ranges
    val a = ops.MultimodalLib.mmDecodeFeatures(spark, sf)
      .select("doc_id", "f0").as[(Long, Double)].collect().toMap
    val docs = Tables.load(spark, sf, "documents").repartition(7)
    docs.createOrReplaceTempView("unused") // ensure no caching illusions
    val b = ops.MultimodalLib.mmDecodeFeatures(spark, sf)
      .select("doc_id", "f0").as[(Long, Double)].collect().toMap
    assert(a == b)
    assert(a.values.forall(v => v >= 0.0 && v <= 1.0 && !v.isNaN))
  }

  test("phash clusters: pair endpoints share a canonical id, survivor is " +
    "the component minimum") {
    val clusters = ops.Multimodal.mmPhashClusters(spark, sf)
      .select("doc_id", "canonical_id", "cluster_size", "is_survivor")
      .as[(Long, Long, Long, Boolean)].collect()
    val lbl = clusters.map(c => c._1 -> c._2).toMap
    val pairs = ops.Multimodal.mmPhashPairs(spark, sf)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty, "fixture yields no phash pairs — spec is vacuous")
    pairs.foreach { case (a, b) =>
      assert(lbl(a) == lbl(b), s"pair ($a,$b) split across clusters")
    }
    // canonical id is the minimum of its component; exactly one survivor
    clusters.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.map(_._1).min == canon)
      assert(members.count(_._4) == 1)
      assert(members.forall(_._3 == members.length))
    }
    OpCaches.releaseAll()
  }

  test("phash pairs: recall on true image dups, precision vs pixel compare") {
    import ops.MultimodalLib.{dHash64, decodePng, encodePngPrefix, lumaGrid8}
    // constructed ground truth: the fixture plus exact copies of 5 docs
    // (offset ids) — each copy renders a pixel-identical image, so the
    // banding MUST surface every (original, copy) pair at hamming 0
    val docs = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val copies = docs.filter(col("doc_id") < 5)
      .withColumn("doc_id", col("doc_id") + 100000)
    val pairs = ops.Multimodal.phashPairs(spark, docs.unionByName(copies))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for (i <- 0L until 5L)
      assert(pairs.exists(p => p._1 == i && p._2 == i + 100000 && p._3 == 0),
        s"missed exact image dup ($i, ${i + 100000})")
    // precision vs the EXACT pixel compare: emitted pairs' decoded 8x8
    // grids are far closer than a random-pair baseline
    val txt = docs.unionByName(copies)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def grid(id: Long): Array[Double] = {
      val (w, _, px) = decodePng(encodePngPrefix(txt(id)))
      lumaGrid8(px, w)
    }
    def dist(a: Long, b: Long): Double =
      grid(a).zip(grid(b)).map { case (x, y) => math.abs(x - y) }.sum / 64
    val emitted = pairs.map(p => dist(p._1, p._2))
    val rnd = new scala.util.Random(7)
    val ids = txt.keys.toArray
    val baseline = Seq.fill(200) {
      val a = ids(rnd.nextInt(ids.length)); val b = ids(rnd.nextInt(ids.length))
      dist(a, b)
    }.sum / 200
    assert(emitted.nonEmpty)
    assert(emitted.sum / emitted.size < baseline / 2,
      s"emitted avg ${emitted.sum / emitted.size} not << baseline $baseline")
    // the hash itself is what the op computed (decode path deterministic)
    assert(dHash64(txt(0L)) == dHash64(txt(100000L)))
  }

  test("cap stats: fixture caps accounted; hot buckets dropped AND counted") {
    // the three text/embedding caps are untouched at fixture scale — the
    // main ops' recall is not silently cap-limited where the oracle can't
    // see it (the audit twin is what proves this at any scale)
    val ng = ops.Dedup.dedupNgramCapStats(spark, sf).head
    assert(ng.getLong(0) > 0 && ng.getLong(1) == 0 && ng.getLong(3) == 0)
    val ec = ops.Dedup.dedupEmbcosCapStats(spark, sf).head
    assert(ec.getLong(0) > 0 && ec.getLong(2) == 0 && ec.getLong(3) == 0)
    val sh = ops.Dedup.dedupSimhashCapStats(spark, sf).head
    assert(sh.getLong(0) > 0 && sh.getLong(1) == 0 && sh.getLong(2) == 0)
    // the phash cap IS active on the fixture (text-derived luma images
    // share band keys): drops must be accounted, never silent
    val ph = ops.Multimodal.mmPhashCapStats(spark, sf).head
    assert(ph.getLong(0) > 0)
    assert(ph.getLong(1) > 0, "fixture phash cap expected active")
    assert(ph.getLong(2) > 0, "dropped pair mass must be accounted")
    // constructed hot bucket: 70 copies of one doc exceed the 64 cap in
    // every band — the cap drops the clique from pair generation AND the
    // audit frame counts every dropped row (nothing silently vanishes)
    val base = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val one = base.filter(col("doc_id") === 0)
    val clique = (1 to 70).map(i =>
        one.withColumn("doc_id", col("doc_id") + lit(200000 + i)))
      .reduce(_ unionByName _)
    val aug = base.unionByName(clique)
    val pairs = ops.Multimodal.phashPairs(spark, aug)
      .filter(col("id_a") >= 200000 && col("id_b") >= 200000).count()
    assert(pairs == 0, "over-cap clique must not explode into pairs")
    val cnt = ops.Multimodal.phashBandRows(spark, aug)
      .filter(col("doc_id") >= 200000 && col("cnt") > 64).count()
    assert(cnt == 70 * 4L, s"every clique band row must be counted, got $cnt")
  }

  test("int8 quantization: error bounded by half a step, codes in range") {
    val rows = ops.Vectors.vecQuantizeInt8(spark, sf)
      .select("scale", "max_abs_err", "mse")
      .as[(Double, Double, Double)].collect()
    assert(rows.length == Tables.load(spark, sf, "embeddings").count())
    rows.foreach { case (s, maxErr, mse) =>
      assert(s > 0)
      // round-to-nearest ⇒ per-component error ≤ scale/2 (+ fp slack)
      assert(maxErr <= s / 2 * (1 + 1e-9), s"err $maxErr > step/2 ${s / 2}")
      assert(mse <= (s / 2) * (s / 2) * (1 + 1e-9))
    }
  }

  test("stratified split: deterministic, balanced, every stratum covered") {
    val s = ops.Pipeline.sampleStratified(spark, sf)
      .select("doc_id", "lang", "split").as[(Long, String, String)].collect()
    val s2 = ops.Pipeline.sampleStratified(spark, sf)
      .select("doc_id", "lang", "split").as[(Long, String, String)].collect()
    assert(s.sorted.sameElements(s2.sorted), "split must be deterministic")
    val frac = s.count(_._3 == "train").toDouble / s.length
    assert(frac > 0.65 && frac < 0.95, s"train fraction $frac off 0.8")
    // every language stratum must land docs in the training split
    val langs = s.map(_._2).distinct
    langs.foreach { l =>
      assert(s.exists(r => r._2 == l && r._3 == "train"), s"$l has no train docs")
    }
  }

  test("sequence packing: shards contiguous, token budget respected") {
    val packed = ops.Pipeline.pipelinePackSequences(spark, sf)
    // shard ids form a contiguous range from 0
    val shards = packed.select("shard").distinct().as[Long].collect().sorted
    assert(shards.head == 0L && shards.sameElements(shards.indices.map(_.toLong)))
    // a shard overflows only by its own last document (greedy packing law)
    val over = packed.groupBy("shard")
      .agg(sum("n_tokens").as("tok"), max("n_tokens").as("mx"))
      .filter(col("tok") - col("mx") >= 4096).count()
    assert(over == 0, "shard exceeds budget by more than its last doc")
  }

  test("source mix: keep rate tracks the per-source recipe") {
    val mix = ops.Pipeline.pipelineSourceMix(spark, sf)
    val byRate = mix.groupBy("rate_pct")
      .agg(avg(col("keep").cast("double")).as("frac"), count(lit(1)).as("n"))
      .as[(Int, Double, Long)].collect()
      .map { case (r, f, n) => r -> (f, n) }.toMap
    byRate.foreach { case (rate, (frac, n)) =>
      assert(math.abs(frac - rate / 100.0) < 0.15,
        s"rate $rate%: kept ${frac * 100}%% of $n docs")
    }
  }

  test("pii scrub: no email or phone pattern survives redaction") {
    // rebuild the scrubbed text the op hashes and scan it for leftovers
    val leftovers = Tables.load(spark, sf, "documents")
      .withColumn("payload", concat(col("text"),
        lit(" Contact: "), col("source"), col("doc_id"), lit("@example.com"),
        lit(" or 555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
      .withColumn("scrubbed", regexp_replace(
        regexp_replace(col("payload"), "[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+", "<EMAIL>"),
        "\\b555-[0-9]{4}\\b", "<PHONE>"))
      .filter(col("scrubbed").rlike("@") || col("scrubbed").rlike("555-[0-9]{4}"))
      .count()
    assert(leftovers == 0, s"$leftovers docs still carry PII after scrub")
    val scrub = ops.Pipeline.textPiiScrub(spark, sf)
    assert(scrub.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0,
      "every doc carries at least the synthesized email and phone")
  }

  test("tokenize tf: total tf equals total token count") {
    val tf = ops.Text.textTokenizeTf(spark, sf)
      .agg(sum("tf")).as[Long].head()
    val direct = ops.Text.textTokenCount(spark, sf)
      .agg(sum("n_ws_tokens")).as[Long].head()
    assert(tf == direct)
  }

  test("bpe encode: greedy merge application laws") {
    def run(toks: Seq[String], merges: Seq[String]): (Long, String) = {
      val d = Seq((0L, toks)).toDF("doc_id", "t")
      val m = Seq(Tuple1(merges)).toDF("merges")
      val r = ops.Text.bpeApply(d, m)
        .select("n_bpe_tokens", "encoded").head
      (r.getLong(0), r.getString(1))
    }
    // left-to-right NON-OVERLAP: "a a a" under (a,a) → [a_a, a], never
    // [a_a, a_a]
    assert(run(Seq("a", "a", "a"), Seq("a a")) == (2L, "a_a  a"))
    // ADJACENT occurrences both merge in one pass: "a b a b" → [a_b, a_b]
    assert(run(Seq("a", "b", "a", "b"), Seq("a b")) == (2L, "a_b  a_b"))
    // priority: an occurrence consumed by a higher-ranked merge is gone
    // for lower-ranked ones ("a b c" under [(a,b), (b,c)] → [a_b, c])
    assert(run(Seq("a", "b", "c"), Seq("a b", "b c")) == (2L, "a_b  c"))
    // ...and the lower-ranked merge still fires where it survives
    assert(run(Seq("x", "b", "c"), Seq("a b", "b c")) == (2L, "x  b_c"))
    // merged tokens never cascade (the list holds base-token pairs only)
    assert(run(Seq("a", "b", "b"), Seq("a b", "b b")) == (2L, "a_b  b"))
    // empty doc → 0 tokens
    assert(run(Nil, Seq("a b"))._1 == 0L)
    // fixture-level: the loop to pack_sequences' budgets is real — merges
    // actually fire, and counts reconcile
    val e = ops.Text.textBpeEncode(spark, sf)
    assert(e.filter(col("n_merged") > 0).count() > 0, "no merges fired")
    assert(e.filter(col("n_bpe_tokens") + col("n_merged")
      =!= col("n_ws_tokens")).count() == 0)
    OpCaches.releaseAll()
  }

  test("lang id guess is the argmax of the hit counts") {
    // fixture lang labels are synthetic (the text is uniform word soup), so
    // agreement with them is meaningless — assert the mechanism instead:
    // the guessed language's hit count is >= every other hit count.
    val bad = ops.Text.textLangId(spark, sf)
      .withColumn("guessed_hits",
        when(col("lang_guess") === "en", col("en_hits"))
          .when(col("lang_guess") === "es", col("es_hits"))
          .when(col("lang_guess") === "fr", col("fr_hits"))
          .otherwise(col("de_hits")))
      .filter(col("guessed_hits") < col("en_hits")
        || col("guessed_hits") < col("es_hits")
        || col("guessed_hits") < col("fr_hits")
        || col("guessed_hits") < col("de_hits"))
      .count()
    assert(bad == 0)
  }

  test("unigram lm score: strictly negative, token counts reconcile, " +
    "all-common-token doc outscores the corpus median") {
    val lm = ops.Text.textLmScore(spark, sf).collect()
    assert(lm.nonEmpty)
    // ln(c/N) < 0 for every token as long as the vocab has >1 entry
    assert(lm.forall(_.getDouble(2) < 0.0))
    // the scored token count is exactly the whitespace tokenizer's count
    // (same tokens() definition feeds both)
    val tc = ops.Text.textTokenCount(spark, sf)
      .select("doc_id", "n_ws_tokens").as[(Long, Int)].collect().toMap
    assert(lm.forall(r => tc(r.getLong(0)) == r.getLong(1).toInt))
    // mechanism check on a constructed corpus: a doc of only the dominant
    // token must outscore a doc carrying the rare token, and the scores
    // are exactly the mean ln(c/N) terms (N=11: 10×"aa", 1×"zz"; "zz" is
    // below the df-floor, so its term is the <unk> mass ln(1/11) — which
    // for a single rare type equals the uncapped ln(c/N))
    import spark.implicits._
    val docs = Seq((1L, "aa aa aa aa aa aa aa"), (2L, "aa aa aa zz"))
      .toDF("doc_id", "text")
    val scored = ops.Text.lmScore(docs)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(scored(1L) > scored(2L))
    val lnAa = BigDecimal(math.log(10.0 / 11.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lnZz = BigDecimal(math.log(1.0 / 11.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(scored(1L) - lnAa) < 1e-9)
    assert(math.abs(scored(2L) - (3 * lnAa + lnZz) / 4) < 1e-9)
    OpCaches.releaseAll()
  }

  test("unigram lm df-floor: rare types share the <unk> mass, floor below " +
    "min count is a no-op, broadcast model shrinks to the kept vocab") {
    import spark.implicits._
    // N=12: 9×"aa", plus hapaxes "xx" "yy" "zz" → unk mass 3. With the
    // floor=2 default each hapax scores ln(3/12), NOT ln(1/12): the cap is
    // OBSERVABLE (collapsed mass is shared), unlike the uncapped model.
    val docs = Seq((1L, "aa aa aa aa aa aa aa aa aa"), (2L, "xx yy zz"))
      .toDF("doc_id", "text")
    val capped = ops.Text.lmScore(docs)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(capped(2L) - r6(math.log(3.0 / 12.0))) < 1e-9)
    // floor=1 (below every corpus count) reproduces the uncapped model
    val uncapped = ops.Text.lmScore(docs, floor = 1L)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(math.abs(uncapped(2L) - r6(math.log(1.0 / 12.0))) < 1e-9)
    assert(math.abs(uncapped(1L) - capped(1L)) < 1e-9)
    // the cap actually bounds the model: with floor=10 nothing is kept
    // and every token scores the full-corpus <unk> term ln(12/12)=0
    val all = ops.Text.lmScore(docs, floor = 100L)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(math.abs(all(1L) - 0.0) < 1e-9 && math.abs(all(2L) - 0.0) < 1e-9)
    OpCaches.releaseAll()
  }

  test("text_lm_cap_stats: kept/rare types and mass reconcile against the " +
    "fixture token counts, and rare_mass is the <unk> mass lmScore uses") {
    import spark.implicits._
    val st = ops.Text.textLmCapStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(st.keySet == Set("unigram", "bigram"))
    // totals reconcile with the tf table: types = vocab size, mass = tokens
    val tf = ops.Text.textTokenizeTf(spark, sf)
      .select("tf").as[Long].collect()
    val (ku, ru, km, rm) = st("unigram")
    assert(ku + ru == tf.length)
    assert(km + rm == tf.sum)
    assert(ru == tf.count(_ < ops.Text.LmCountFloor))
    // the synthetic vocab has no unigram hapaxes (31 types, all count>=2,
    // so the unigram cap is a fixture no-op) but the BIGRAM table does →
    // the floor is LIVE in the gated text_lm_bigram op
    assert(rm == 0 && km > 0)
    val (kb, rb, kmb, rmb) = st("bigram")
    assert(kb > 0 && kmb > 0)
    assert(rb > 0 && rmb > 0, "fixture has no rare bigrams; floor cap untested")
    OpCaches.releaseAll()
  }

  test("bigram lm score: row-stochastic conditionals with the df-floor, " +
    "hand-checked corpus") {
    import spark.implicits._
    // c2: (a,b)=3 (b,a)=1 (a,a)=1 (b,b)=1 → c1: a=4, b=2. With floor=2
    // only (a,b) is kept; the three rare pairs share the global fallback
    // ln(rare_mass/total) = ln(3/6).
    val docs = Seq((1L, "a b a b"), (2L, "a a b b")).toDF("doc_id", "text")
    val out = ops.Text.lmBigram(docs)
      .select("doc_id", "n_bigrams", "avg_logp2")
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = r6(math.log(0.75))     // kept: c2/c1 = 3/4
    val pUnk = r6(math.log(0.5))     // rare fallback: 3/6
    assert(out(1L)._1 == 3L)
    assert(math.abs(out(1L)._2 - (pAB + pUnk + pAB) / 3) < 1e-9)
    assert(out(2L)._1 == 3L)
    assert(math.abs(out(2L)._2 - (pUnk + pAB + pUnk) / 3) < 1e-9)
    // fluency beats the unigram signal: both docs share the same unigram
    // multiset, yet the spliced doc (2) scores strictly lower
    assert(out(1L)._2 > out(2L)._2)
    // floor=1 (below every pair count) reproduces the uncapped
    // row-stochastic model exactly: p(b|a) = c2/c1 per pair
    val un = ops.Text.lmBigram(docs, floor = 1L)
      .select("doc_id", "avg_logp2").as[(Long, Double)].collect().toMap
    val (pBA, pAA, pBB) =
      (r6(math.log(0.5)), r6(math.log(0.25)), r6(math.log(0.5)))
    assert(math.abs(un(1L) - (pAB + pBA + pAB) / 3) < 1e-9)
    assert(math.abs(un(2L) - (pAA + pAB + pBB) / 3) < 1e-9)
    // single-token docs carry no bigram → absent, not crashed
    val one = ops.Text.lmBigram(Seq((9L, "solo")).toDF("doc_id", "text"))
    assert(one.count() == 0)
    OpCaches.releaseAll()
  }

  test("containment dedup: catches a doc embedded in a larger one that " +
    "jaccard misses, and reduces to inter/min-size exactly") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("contain").toString
    // doc 2 = doc 1's opening verbatim; doc 1 continues with 4x more
    // unique text → jaccard diluted under 0.3, containment 1.0
    val core = (1 to 12).map(i => s"alpha$i beta$i gamma$i").mkString(" ")
    val tail = (1 to 160).map(i => s"unique$i token$i filler$i").mkString(" ")
    val rows = Seq(
      (1L, s"$core $tail", "en", "web", 10L),
      (2L, core, "en", "news", 10L),
      (3L, "wholly unrelated text about something else entirely here okay",
        "en", "web", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val con = ops.Dedup.dedupContainment(spark, tmp)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect()
    assert(con.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    // doc 2's shingles are all in doc 1 → containment exactly 1.0
    assert(con.head._3 == 1.0)
    // the symmetric jaccard pass does NOT pair them (dilution)
    val jac = ops.Dedup.dedupNgramJaccard(spark, tmp)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)),
      "fixture too small: jaccard also caught the pair, containment adds nothing")
    OpCaches.releaseAll()
  }

  test("containment on the fixture corpus: superset of high-jaccard " +
    "near-dups, measure laws hold") {
    val con = ops.Dedup.dedupContainment(spark, sf)
      .select("id_a", "id_b", "inter", "containment")
      .as[(Long, Long, Long, Double)].collect()
    assert(con.nonEmpty)
    assert(con.forall(r => r._4 >= 0.8 && r._4 <= 1.0))
    assert(con.forall(r => r._1 < r._2))
    // jaccard >= 0.8 implies containment >= 0.8 (inter/min >= inter/union):
    // every very-near dup pair must re-appear here
    val highJ = ops.Dedup.dedupNgramJaccard(spark, sf)
      .filter(col("jaccard") >= 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cp = con.map(r => (r._1, r._2)).toSet
    assert(highJ.subsetOf(cp), s"missing: ${highJ -- cp}")
    OpCaches.releaseAll()
  }

  test("lm split: per-lang terciles balanced to within one, head outscores " +
    "tail, buckets reconcile with the lm score table") {
    val split = ops.Text.textLmSplit(spark, sf)
      .select("doc_id", "lang", "avg_logp", "bucket")
      .as[(Long, String, Double, String)].collect()
    val scores = ops.Text.textLmScore(spark, sf)
      .select("doc_id", "avg_logp").as[(Long, Double)].collect().toMap
    assert(split.length == scores.size)
    assert(split.forall(r => scores(r._1) == r._3))
    for ((lang, rows) <- split.groupBy(_._2)) {
      val byBucket = rows.groupBy(_._4).view.mapValues(_.length).toMap
      val sizes = Seq("head", "middle", "tail").map(byBucket.getOrElse(_, 0))
      assert(sizes.max - sizes.min <= 1, s"$lang terciles: $byBucket")
      // min head score >= max tail score (desc rank order)
      val head = rows.filter(_._4 == "head").map(_._3)
      val tail = rows.filter(_._4 == "tail").map(_._3)
      if (head.nonEmpty && tail.nonEmpty)
        assert(head.min >= tail.max, s"$lang: head/tail overlap")
    }
    OpCaches.releaseAll()
  }

  test("winnowing: the coverage guarantee — docs sharing a >= w+k-1 token " +
    "run share a fingerprint; density stays near 2/(w+1)") {
    import spark.implicits._
    // two documents embedding the SAME 12-token run at different offsets,
    // surrounded by disjoint text; guarantee: any shared run of
    // w+k-1 = 6 tokens yields at least one shared fingerprint VALUE
    val run = "rose tulip daisy orchid lily fern moss ivy oak elm birch pine"
    val docs = Seq(
      (1L, s"aa bb cc dd ee $run ff gg hh", "en", "x", 1L),
      (2L, s"zz yy $run xx ww vv uu tt ss rr qq pp", "en", "y", 1L),
      (3L, "totally different words about nothing shared at all here okay then",
        "en", "z", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")
    val fp = ops.Text.textWinnowing(spark, dir)
      .select("doc_id", "fp").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty,
      "shared 12-token run produced no shared fingerprint")
    assert(fp(1L).intersect(fp(3L)).isEmpty &&
      fp(2L).intersect(fp(3L)).isEmpty,
      "disjoint doc shares a fingerprint (hash collision or bug)")
    // density on the fixture corpus: selected prints per window position
    // land near the 2/(w+1) winnowing bound — well under 1 per shingle
    val corpus = ops.Text.textWinnowing(spark, sf)
    val nPrints = corpus.count().toDouble
    val nWindows = Tables.load(spark, sf, "documents")
      .select(size(filter(split(lower(col("text")), "[^a-z0-9']+"),
        t => t =!= "")).as("n"))
      .filter(col("n") >= 6)
      .agg(sum(col("n") - 5)).as[Long].head().toDouble
    val density = nPrints / nWindows
    assert(density > 0.2 && density < 0.8, s"density $density")
    OpCaches.releaseAll()
  }

  test("filter funnel: monotone stage counts that reconcile with the real " +
    "pipeline — n_final IS pipeline_curate's row count") {
    val f = ops.Pipeline.pipelineFilterFunnel(spark, sf).head()
    val (nIn, s1, s2, s3, s4) =
      (f.getLong(0), f.getLong(1), f.getLong(2), f.getLong(3), f.getLong(4))
    // cumulative stages can only shrink, and every stage drops something
    // on the fixture (exact dups, low quality, short docs all planted)
    assert(nIn >= s1 && s1 >= s2 && s2 >= s3 && s3 >= s4)
    assert(nIn == Tables.load(spark, sf, "documents").count())
    // the funnel audits the REAL pipeline: its final count is exactly the
    // curated output's cardinality
    assert(s4 == ops.Pipeline.pipelineCurate(spark, sf).count())
    // dedup-stage drop on a constructed corpus (sf0.001 has no exact
    // dups): two identical docs → one survivor
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("funnel").toString
    val body = "the quick brown fox jumps over the lazy dog again and " +
      "again for a story of at least twenty tokens in total here"
    Seq((1L, body, "en", "a", body.length.toLong),
      (2L, body, "en", "a", body.length.toLong),
      (3L, "short text", "en", "a", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    Seq((1L, Array.fill(4)(0.5f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$tmp/embeddings.parquet")
    val g = ops.Pipeline.pipelineFilterFunnel(spark, tmp).head()
    // 3 in; dedup drops the copy (2 survive); "short text" fails quality/
    // length; only doc 1 carries an embedding
    assert(g.getLong(0) == 3L && g.getLong(1) == 2L)
    assert(g.getLong(3) == 1L && g.getLong(4) == 1L)
    OpCaches.releaseAll()
  }

  test("corpus stats: per-source datasheet reconciles with doc counts and " +
    "the token-count table") {
    val st = ops.Pipeline.pipelineCorpusStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))).toMap
    val docs = Tables.load(spark, sf, "documents")
      .select("source", "doc_id", "n_chars").as[(String, Long, Long)].collect()
    assert(st.keySet == docs.map(_._1).toSet)
    val tc = ops.Text.textTokenCount(spark, sf)
      .select("doc_id", "n_ws_tokens").as[(Long, Int)].collect().toMap
    for ((src, (nDocs, nToks, nLangs, avgChars, shortDocs)) <- st) {
      val mine = docs.filter(_._1 == src)
      assert(nDocs == mine.length)
      assert(nToks == mine.map(d => tc(d._2).toLong).sum)
      assert(shortDocs == mine.count(d => tc(d._2) < 50))
      assert(nLangs >= 1)
      assert(math.abs(avgChars -
        mine.map(_._3).sum.toDouble / mine.length) < 1e-6)
    }
    OpCaches.releaseAll()
  }

  test("bm25: row set is exactly the matching docs and every score " +
    "reproduces an imperative Okapi reference") {
    val q = Seq("spark", "window", "merge")
    val toks = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
      .map { case (id, t) =>
        id -> t.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq }
    val n = toks.length.toDouble
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / toks.length
    val dfm = q.map(t => t -> toks.count(_._2.contains(t)).toDouble).toMap
    def ref(ts: Seq[String]): (Int, Double) = {
      val dl = ts.size.toDouble
      var acc = BigDecimal(0)
      var m = 0
      for (t <- q) {
        val tf = ts.count(_ == t).toDouble
        if (tf > 0) {
          m += 1
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          val s = idf * tf * (1.2 + 1) /
            (tf + 1.2 * ((1 - 0.75) + 0.75 * (dl / avgdl)))
          acc += BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      }
      (m, acc.toDouble)
    }
    val expected = toks.map { case (id, ts) => id -> ref(ts) }
      .filter(_._2._1 >= 1).toMap
    val out = ops.Text.textBm25(spark, sf)
      .select("doc_id", "n_terms_matched", "bm25")
      .as[(Long, Int, Double)].collect()
    assert(out.map(_._1).toSet == expected.keySet)
    out.foreach { case (id, m, s) =>
      assert(m == expected(id)._1, s"doc $id matched-term count")
      assert(math.abs(s - expected(id)._2) < 1e-9, s"doc $id score $s")
      assert(s > 0.0, s"doc $id nonpositive score")
    }
  }

  test("text_readability: hand-computed FK grades on constructed docs; " +
    "monosyllabic short sentences score lowest") {
    val tmp = java.nio.file.Files.createTempDirectory("fk").toString
    val rows = Seq(
      // 1 word, 1 sentence, 1 syllable: 0.39 + 11.8 - 15.59 = -3.4
      (1L, "cat.", "en", "gen", 4L),
      // "incomprehensibility" = i-nco-mpre-he-nsi-bi-li-ty: vowel groups
      // i,o,e,e,i,i,i,y = 8 → 0.39·1 + 11.8·8 − 15.59
      (2L, "incomprehensibility.", "en", "gen", 20L),
      // 6 words over 2 sentences, all monosyllables: no sentence split drift
      (3L, "the cat sat! it ran off.", "en", "gen", 24L))
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$tmp/documents.parquet")
    val out = ops.Text.textReadability(spark, tmp)
      .select("doc_id", "n_words", "n_sentences", "n_syllables", "fk_grade")
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 1L, 1L, 1L, 0.39 + 11.8 - 15.59)))
    assert(out(2L)._4 === 8L)
    assert(out(2L)._5 === 0.39 + 11.8 * 8.0 - 15.59)
    assert(out(3L) === ((3L, 6L, 2L, 6L,
      0.39 * 3.0 + 11.8 * 1.0 - 15.59)))
    // complexity monotonicity: the polysyllabic doc grades hardest
    assert(out(2L)._5 > out(3L)._5 && out(3L)._5 > out(1L)._5)
  }
}
