package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** 63-bit SimHash signature from an array of 64-bit token hashes — the
  * fused form of the per-bit majority vote (reference semantics: SURVEY.md
  * §2.10 dedup_simhash; bit 63 dropped so downstream power-of-two sums stay
  * within a signed long under ANSI overflow checking).
  *
  * Equivalent declarative plan: explode(tokens) × explode(0..62) →
  * groupBy(doc, bit).sum(vote) → groupBy(doc).sum(1<<bit) — i.e. a
  * tokens×63-row shuffle. This expression computes the identical value in
  * one primitive loop per row inside WholeStageCodegen: zero shuffle,
  * O(tokens×63) register arithmetic. Null elements are skipped; a null
  * array yields null.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](63)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 63) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 63) {
      if (counts(b) > 0) r |= 1L << b
      b += 1
    }
    r
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val r = ctx.freshName("r")
      s"""
         |final int $n = $arr.numElements();
         |final int[] $counts = new int[63];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final long $h = $arr.getLong($i);
         |    for (int $b = 0; $b < 63; $b++) {
         |      $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |    }
         |  }
         |}
         |long $r = 0L;
         |for (int $b = 0; $b < 63; $b++) {
         |  if ($counts[$b] > 0) $r |= 1L << $b;
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
