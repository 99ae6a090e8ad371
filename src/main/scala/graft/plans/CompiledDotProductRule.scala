package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Catalyst optimizer rule (the (c)-tier extension path): rewrites the
  * idiomatic-but-interpreted higher-order-function dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v) }}}
  *
  * into the compiled [[graft.functions.DotProduct]] loop. The HOF
  * composition is what a SQL user naturally writes — and it evaluates
  * per-element through interpreted `Expression.eval` with boxing, measured
  * ~1000× slower than the compiled loop on 64-dim embeddings (see
  * ArrayOps). The rewrite is exact: both forms null-propagate, both yield
  * null on length mismatch (zip_with null-pads, the null survives the sum),
  * and both accumulate left-to-right in double precision.
  *
  * Guards: double arrays only (float inputs arrive with casts inside the
  * lambda, changing per-element rounding), multiply over exactly the two
  * lambda variables, accumulate over exactly the two lambda variables, a
  * literal-zero seed, and an identity finish lambda.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`, so any
  * `spark.sql` user of the session gets the compiled path without changing
  * their query text.
  */
object CompiledDotProductRule extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isZeroSeed(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(v, _), DoubleType, _, _) =>
      v != null && v.toString.toDouble == 0.0
    case _ => false
  }

  /** merge lambda is (acc, v) -> acc + v (either operand order). */
  private def isSumMerge(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(a.exprId, v.exprId)
    case _ => false
  }

  /** zip lambda is (x, y) -> x * y (either operand order). */
  private def isProductZip(lf: LambdaFunction): Boolean = lf match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      Set(l.exprId, r.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.HIGH_ORDER_FUNCTION)) {
      case ArrayAggregate(
          ZipWith(a, b, zl: LambdaFunction), seed, ml: LambdaFunction, finish)
        if isDoubleArray(a) && isDoubleArray(b) && isZeroSeed(seed) &&
          isProductZip(zl) && isSumMerge(ml) && isIdentityFinish(finish) =>
        DotProduct(a, b)
    }
}
