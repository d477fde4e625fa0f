package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.expressions.Aggregator

/** Registration surface for graft's custom Catalyst functions.
  *
  * Production path: `spark.sql.extensions=graft.functions.GraftExtensions`
  * injects them at session build. Library path: [[GraftFunctions.register]]
  * adds them to an existing session's registry (idempotent) — used by the
  * driver-contract queries, which receive an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => VecDotRewrite)
  }
}

object GraftFunctions {

  private[functions] val descriptors = Seq(
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1)): Expression),
    (new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head): Expression),
    (new FunctionIdentifier("md5_words"),
      new ExpressionInfo(classOf[Md5Words].getName, "md5_words"),
      (children: Seq[Expression]) => Md5Words(children.head): Expression),
    (new FunctionIdentifier("band_keys"),
      new ExpressionInfo(classOf[BandKeys].getName, "band_keys"),
      (children: Seq[Expression]) => BandKeys(children.head): Expression),
    (new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_sig(arr, n): n must be an int literal, got $other")
        }
        MinHashSig(children.head, n): Expression
      }))

  /** Idempotently register graft functions (and the [[VecDotRewrite]]
    * optimizer rule) on a live session. */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, info, builder) =>
      if (!spark.sessionState.functionRegistry.functionExists(id))
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(VecDotRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecDotRewrite
  }

  /** `vec_dot` as a Column (via the registry, so plans serialize cleanly). */
  def vecDot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  }

  /** `band_keys` as a Column (fused banded sign-LSH signature). */
  def bandKeys(spark: SparkSession, emb: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("band_keys", emb)
  }

  /** `md5_words` as a Column: array(word1, word2) of 60-bit md5 words. */
  def md5Words(spark: SparkSession, s: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("md5_words", s)
  }

  /** `simhash64` as a Column. */
  def simHash64(spark: SparkSession, hashes: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("simhash64", hashes)
  }

  /** `minhash_sig` as a Column (n must be a literal). */
  def minHashSig(spark: SparkSession, hashes: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("minhash_sig", hashes,
      org.apache.spark.sql.functions.lit(n))
  }

  /** Exact micro-unit centroid Aggregator (SURVEY §2.9 vector-centroid
    * UDAF): accumulates each component as a scale-6 decimal long (the same
    * quantization as Tables.dsum), so the sum is an order-independent
    * integer and the result matches the posexplode+decimal formulation
    * bit-for-bit regardless of partitioning. */
  /** Misra–Gries heavy-hitter sketch (Misra & Gries 1982; the "frequent"
    * algorithm) as a typed partial Aggregator — the SURVEY §2.9 UDAF
    * surface applied to frequency estimation. Buffer = at most `k`
    * (item, counter) pairs; `reduce` is the classic decrement-all step,
    * `merge` sums two sketches then subtracts the (k+1)-th largest
    * counter and drops the non-positive (the standard mergeable-summary
    * rule, Agarwal et al. 2012), which preserves THE guarantee: any item
    * with global count > N/k survives in the merged sketch (by the
    * pigeonhole/averaging argument over partitions). The sketch is a
    * CANDIDATE GENERATOR — counters are not exact counts — so the
    * consuming op pairs it with an exact verify pass over just the ≤ k
    * candidates; see [[graft.ops.Aggregates]] agg_heavy_hitters. */
  class MisraGries(k: Int)
    extends Aggregator[String, (Array[String], Array[Long]), Map[String, Long]] {
    // buffer = parallel (item, counter) arrays of length <= k, MUTATED in
    // place between rows (the VecCentroid discipline — Aggregator buffers
    // are live JVM objects until an exchange serializes them): the per-row
    // hot path is one linear scan over <= k entries with no allocation;
    // the only copies happen on the rare grow/evict events

    override def zero: (Array[String], Array[Long]) =
      (Array.empty[String], Array.empty[Long])

    override def reduce(b: (Array[String], Array[Long]),
        v: String): (Array[String], Array[Long]) = {
      val (ts, cs) = b
      var i = 0
      while (i < ts.length) {
        if (ts(i) == v) { cs(i) += 1; return b }
        i += 1
      }
      if (ts.length < k) (ts :+ v, cs :+ 1L)
      else { // decrement every counter; compact out the zeroed
        var kept = 0
        i = 0
        while (i < cs.length) { cs(i) -= 1; if (cs(i) > 0) kept += 1; i += 1 }
        if (kept == cs.length) b
        else {
          val nt = new Array[String](kept); val nc = new Array[Long](kept)
          var j = 0; i = 0
          while (i < cs.length) {
            if (cs(i) > 0) { nt(j) = ts(i); nc(j) = cs(i); j += 1 }
            i += 1
          }
          (nt, nc)
        }
      }
    }

    override def merge(a: (Array[String], Array[Long]),
        b: (Array[String], Array[Long])): (Array[String], Array[Long]) = {
      val sum = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      var i = 0
      while (i < a._1.length) { sum(a._1(i)) = a._2(i); i += 1 }
      i = 0
      while (i < b._1.length) {
        sum(b._1(i)) = sum.getOrElse(b._1(i), 0L) + b._2(i); i += 1
      }
      val trimmed =
        if (sum.size <= k) sum.toSeq
        else { // subtract the (k+1)-th largest counter; drop non-positive
          val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
          sum.toSeq.collect { case (t, c) if c > d => t -> (c - d) }
        }
      (trimmed.map(_._1).toArray, trimmed.map(_._2).toArray)
    }

    override def finish(r: (Array[String], Array[Long])): Map[String, Long] =
      r._1.zip(r._2).toMap

    override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[String], Array[Long])] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[String], Array[Long])]()

    override def outputEncoder: org.apache.spark.sql.Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  class VecCentroid(dim: Int)
    extends Aggregator[Array[Float], (Array[Long], Long), Array[Double]] {

    override def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)

    override def reduce(b: (Array[Long], Long), v: Array[Float]): (Array[Long], Long) = {
      var i = 0
      while (i < dim && i < v.length) {
        b._1(i) += BigDecimal(v(i).toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).underlying.unscaledValue.longValue
        i += 1
      }
      (b._1, b._2 + 1)
    }

    override def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
      var i = 0
      while (i < dim) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

    override def finish(r: (Array[Long], Long)): Array[Double] =
      r._1.map(m => (m.toDouble / 1e6) / r._2)

    override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Long], Long)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Exact distinct-count over int64 ids as a MERGEABLE bitmap summary —
    * the ClickHouse `groupBitmap` / Druid bitmap-aggregator shape, and the
    * exact counterpart of approx_count_distinct's HLL: where
    * `COUNT(DISTINCT x)` forces Spark to shuffle EVERY distinct value
    * (Expand + two exchanges), this Aggregator reduces each map task's
    * slice to a paged bitset, so what crosses the wire per group is
    * O(id-range/8 bytes) of pages, partial-aggregated and OR-merged —
    * the standard trade for dense bounded id spaces (users, devices,
    * entity keys), exact under any partitioning. Buffer = page-index →
    * 4096-bit word array (a roaring-bitmap-lite: absent pages cost
    * nothing, so sparse id spaces stay proportional to |distinct|, not
    * max-id). Negative ids map by floor division, so the full int64
    * domain is valid. Input is boxed and NULL ids are skipped — the
    * COUNT(DISTINCT) semantics the op's oracle carries (a scalaLong
    * input encoder would fail or zero-count a null row instead). */
  class BitmapDistinct
    extends Aggregator[java.lang.Long, Map[Long, Array[Long]], Long] {
    private val PageBits = 4096L // 64 words/page

    override def zero: Map[Long, Array[Long]] = Map.empty

    override def reduce(b: Map[Long, Array[Long]],
        boxed: java.lang.Long): Map[Long, Array[Long]] = {
      if (boxed == null) return b
      val v = boxed.longValue
      val page = java.lang.Math.floorDiv(v, PageBits)
      val bit = java.lang.Math.floorMod(v, PageBits).toInt
      b.get(page) match {
        case Some(words) => // in-place on the live buffer (VecCentroid discipline)
          words(bit >> 6) |= (1L << (bit & 63)); b
        case None =>
          val words = new Array[Long]((PageBits / 64).toInt)
          words(bit >> 6) |= (1L << (bit & 63))
          b + (page -> words)
      }
    }

    override def merge(a: Map[Long, Array[Long]],
        b: Map[Long, Array[Long]]): Map[Long, Array[Long]] = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      small.foldLeft(big) { case (acc, (page, words)) =>
        acc.get(page) match {
          case Some(w) =>
            var i = 0
            while (i < w.length) { w(i) |= words(i); i += 1 }
            acc
          case None => acc + (page -> words)
        }
      }
    }

    override def finish(r: Map[Long, Array[Long]]): Long =
      r.valuesIterator.map(_.map(java.lang.Long.bitCount(_).toLong).sum).sum

    override def bufferEncoder: org.apache.spark.sql.Encoder[Map[Long, Array[Long]]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Array[Long]]]()

    override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }
}
