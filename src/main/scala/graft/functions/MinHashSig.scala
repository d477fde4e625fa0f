package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature over an array of 64-bit shingle hashes: for each of
  * `numHashes` hash functions k, the minimum of `xxhash64(k, h)` over the
  * array — BIT-COMPATIBLE with the declarative
  * `transform(sequence(0, n-1), k -> array_min(transform(hs, h -> xxhash64(k, h))))`
  * (Spark's XxHash64 chains `XXH64.hashInt(k, 42)` then `hashLong(h, ·)`;
  * the per-function seeds are precomputed here).
  *
  * The declarative form allocates n+1 intermediate arrays per row; this is
  * one primitive double loop inside WholeStageCodegen. Empty arrays yield
  * an all-Long.MaxValue signature (array_min of empty is null in ANSI-safe
  * plans — callers filter empty shingle sets first, as dedup_minhash does).
  */
case class MinHashSig(child: Expression, numHashes: Int)
  extends UnaryExpression {

  require(numHashes > 0 && numHashes <= 256)

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numHashes)(k => XXH64.hashInt(k, 42L))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var k = 0
        while (k < numHashes) {
          val v = XXH64.hashLong(h, seeds(k))
          if (v < sig(k)) sig(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("seeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val sig = ctx.freshName("sig")
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $arr.numElements();
         |final long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    for (int $k = 0; $k < $numHashes; $k++) {
         |      final long $v = $xxh.hashLong($h, $seedsRef[$k]);
         |      if ($v < $sig[$k]) $sig[$k] = $v;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}
