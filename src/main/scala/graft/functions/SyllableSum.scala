package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Total syllable count of a token array under the standard vowel-group
  * heuristic: per word, the number of maximal `[aeiouy]+` runs, min 1;
  * summed as a long. The fused form of the declarative
  * `aggregate(transform(words, w -> greatest(size(regexp_extract_all(w,
  * '[aeiouy]+', 0)), 1)), 0L, _+_)` — which pays a regex engine invocation
  * AND a matched-substring array allocation PER WORD. This expression
  * computes the identical value in one byte-walk per row inside
  * WholeStageCodegen (round-12 verdict #6: text_readability was the
  * largest per-row constant on the linear surface). Byte-level is exact:
  * tokens are lowercased, and UTF-8 continuation/lead bytes of non-ASCII
  * characters are ≥ 0x80, so they can never equal an ASCII vowel and a
  * multi-byte character simply breaks a vowel run — exactly what the
  * regex on the decoded string does, since no non-ASCII char is in
  * `[aeiouy]`. Null elements are skipped; a null array yields null. */
case class SyllableSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"syllable_sum requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var total = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getUTF8String(i).getBytes
        var runs = 0
        var inRun = false
        var j = 0
        while (j < b.length) {
          val c = b(j)
          val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' ||
            c == 'u' || c == 'y'
          if (v && !inRun) runs += 1
          inRun = v
          j += 1
        }
        total += (if (runs > 0) runs else 1)
      }
      i += 1
    }
    total
  }

  // NOTE: no generated line may START with '|' — the codegen Block
  // interpolator margin-strips leading pipes, so a continuation line
  // beginning with '||' silently compiles to invalid Java and the whole
  // projection falls back to interpreted mode. Break long boolean chains
  // AFTER the operator.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val v = ctx.freshName("v")
      val runs = ctx.freshName("runs")
      val inRun = ctx.freshName("inRun")
      val total = ctx.freshName("total")
      s"""
         |final int $n = $arr.numElements();
         |long $total = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    final byte[] $b = $arr.getUTF8String($i).getBytes();
         |    int $runs = 0;
         |    boolean $inRun = false;
         |    for (int $j = 0; $j < $b.length; $j++) {
         |      final byte $c = $b[$j];
         |      final boolean $v = $c == 'a' || $c == 'e' || $c == 'i' ||
         |        $c == 'o' || $c == 'u' || $c == 'y';
         |      if ($v && !$inRun) $runs++;
         |      $inRun = $v;
         |    }
         |    $total += ($runs > 0) ? $runs : 1;
         |  }
         |}
         |${ev.value} = $total;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SyllableSum =
    copy(child = newChild)

  override def prettyName: String = "syllable_sum"
}
