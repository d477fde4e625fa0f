package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (SURVEY.md §2.9/§4 custom-Catalyst path, the
  * `Rule[LogicalPlan]` tier): rewrites the two canonical declarative
  * dot-product folds into the fused codegen [[VecDot]] expression —
  *
  *  - `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, _+_)`
  *    → `vec_dot(a, b)`
  *  - `aggregate(a, 0.0, (acc,x) => acc + double(x)*double(x))`
  *    → `vec_dot(a, a)`   (the self-dot / squared-norm shape)
  *
  * so a user writing the idiomatic lambda formulation gets the fused
  * primitive loop for free (no intermediate zipped array per row, stays
  * inside WholeStageCodegen). The rewrite is exactly semantics-preserving:
  * VecDot accumulates sequentially in array order, nulls the result on
  * null input / length mismatch / null element — precisely what the fold
  * evaluates (see [[VecDot]]). The match is deliberately narrow — any
  * other zero, merge shape, or element type is left untouched.
  *
  * Installed by `SparkSessionExtensions.injectOptimizerRule`
  * ([[GraftExtensions]]) or on a live session via
  * `spark.experimental.extraOptimizations` ([[GraftFunctions.register]]).
  */
object VecDotRewrite extends Rule[LogicalPlan] {

  private def isVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** body is `double(v)` for exactly the given lambda variable. */
  private def toDouble(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case Cast(nv: NamedLambdaVariable, DoubleType, _, _) =>
        nv.exprId == v.exprId
      case nv: NamedLambdaVariable =>
        nv.exprId == v.exprId && nv.dataType == DoubleType
      case _ => false
    }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(nv: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      nv.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // pairwise fold over zip_with
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(Multiply(mx, my, _),
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, v, _),
            Seq(a: NamedLambdaVariable, e: NamedLambdaVariable), _),
          finish)
        if isVec(l) && isVec(r) && toDouble(mx, x) && toDouble(my, y) &&
          acc.exprId == a.exprId && toDouble(v, e) &&
          isIdentityFinish(finish) =>
        VecDot(l, r)
      // self-dot: acc + double(x) * double(x) over one array
      case ArrayAggregate(
          arr,
          Literal(0.0, DoubleType),
          LambdaFunction(Add(acc: NamedLambdaVariable, Multiply(mx, my, _), _),
            Seq(a: NamedLambdaVariable, e: NamedLambdaVariable), _),
          finish)
        if isVec(arr) && acc.exprId == a.exprId &&
          toDouble(mx, e) && toDouble(my, e) && isIdentityFinish(finish) =>
        VecDot(arr, arr)
    }
}
