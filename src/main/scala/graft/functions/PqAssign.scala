package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused PQ codeword assignment: `pq_assign(sub, books)` returns the `cid`
  * of the codeword in `books` (an `array<struct<cid: bigint, cvec:
  * array<double>>>`, the collected per-subspace codebook) with the
  * smallest squared L2 distance to `sub` (`array<float|double>`), ties
  * broken by the LOWEST cid.
  *
  * Semantics are IDENTICAL to the declarative encode it replaces
  * ([[graft.ops.Vectors]] pqIndex):
  * `max_by(cid, struct(-d2, -cid))` over the K exploded codeword rows,
  * with `d2 = aggregate(zip_with(sub, cvec, (x,y) => (double(x)-y)²),
  * 0.0, _+_)` — the fold accumulates sequentially in array order, so the
  * per-dimension loop below performs the SAME IEEE additions in the SAME
  * order; d² terms are squares of finite inputs, hence ≥ +0.0 and
  * NaN-free, so plain `<` comparison equals Spark's struct ordering on
  * the negated pair. A codeword whose cvec length mismatches `sub` gets a
  * null d2 in the declarative form, which `max_by` ignores — mirrored
  * here by skipping it; all-skipped (or an empty book) yields null, as
  * `max_by` over all-null orderings does.
  *
  * Why it exists (guide §1.2 per-task work, the [[VecDot]] precedent):
  * the declarative encode explodes n·M·K scored rows through a broadcast
  * join, evaluates an INTERPRETED 16-dim lambda fold per row, and
  * re-collapses through a (vec_id, m) hash aggregate — an Exchange over
  * the full code table. The fused form keeps the encode at n·M rows,
  * map-only, inside whole-stage codegen. */
case class PqAssign(left: Expression, right: Expression)
  extends BinaryExpression {

  private def subElem: Option[DataType] = left.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  private def booksOk: Boolean = right.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, LongType, _, _),
      StructField(_, ArrayType(DoubleType, _), _, _))), _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (subElem.isDefined && booksOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "pq_assign requires (array<float|double>, array<struct<bigint, " +
        s"array<double>>>), got (${left.dataType.simpleString}, " +
        s"${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sub = a.asInstanceOf[ArrayData]
    val books = b.asInstanceOf[ArrayData]
    val isFloat = subElem.contains(FloatType)
    val n = sub.numElements()
    var bestCid = 0L
    var bestD2 = 0.0
    var found = false
    var k = 0
    val nk = books.numElements()
    while (k < nk) {
      if (!books.isNullAt(k)) {
        val row = books.getStruct(k, 2)
        val cid = row.getLong(0)
        val cvec = row.getArray(1)
        if (cvec.numElements() == n) {
          var d2 = 0.0
          var i = 0
          while (i < n) {
            val x = if (isFloat) sub.getFloat(i).toDouble else sub.getDouble(i)
            val d = x - cvec.getDouble(i)
            d2 += d * d
            i += 1
          }
          if (!found || d2 < bestD2 || (d2 == bestD2 && cid < bestCid)) {
            found = true; bestD2 = d2; bestCid = cid
          }
        }
      }
      k += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sub, books) => {
      val get = if (subElem.contains(FloatType)) s"(double) $sub.getFloat"
        else s"$sub.getDouble"
      val n = ctx.freshName("n")
      val nk = ctx.freshName("nk")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val row = ctx.freshName("row")
      val cid = ctx.freshName("cid")
      val cvec = ctx.freshName("cvec")
      val d2 = ctx.freshName("d2")
      val d = ctx.freshName("d")
      val bestCid = ctx.freshName("bestCid")
      val bestD2 = ctx.freshName("bestD2")
      val found = ctx.freshName("found")
      s"""
         |final int $n = $sub.numElements();
         |final int $nk = $books.numElements();
         |long $bestCid = 0L;
         |double $bestD2 = 0.0;
         |boolean $found = false;
         |for (int $k = 0; $k < $nk; $k++) {
         |  if (!$books.isNullAt($k)) {
         |    InternalRow $row = $books.getStruct($k, 2);
         |    final long $cid = $row.getLong(0);
         |    final ArrayData $cvec = $row.getArray(1);
         |    if ($cvec.numElements() == $n) {
         |      double $d2 = 0.0;
         |      for (int $i = 0; $i < $n; $i++) {
         |        final double $d = $get($i) - $cvec.getDouble($i);
         |        $d2 += $d * $d;
         |      }
         |      if (!$found || $d2 < $bestD2
         |          || ($d2 == $bestD2 && $cid < $bestCid)) {
         |        $found = true; $bestD2 = $d2; $bestCid = $cid;
         |      }
         |    }
         |  }
         |}
         |${ev.isNull} = !$found;
         |${ev.value} = $bestCid;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
    newLeft: Expression, newRight: Expression): PqAssign =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "pq_assign"
}
