package graft.plans

import graft.functions.{ArrayDot, ArrayL2Sq, ArrayNormSq}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Optimizer rule: recognize the declarative HOF formulations of the
  * vector kernels and swap in the native codegen'd expressions.
  *
  *   aggregate(zip_with(a, b, (x, y) -> dbl(x) * dbl(y)), 0.0, +)             → graft_dot(a, b)
  *   aggregate(a, 0.0, (acc, x) -> acc + dbl(x) * dbl(x))                     → graft_norm_sq(a)
  *   aggregate(zip_with(a, b, (x, y) -> (dbl(x)-dbl(y)) * (dbl(x)-dbl(y))), 0.0, +) → graft_l2_sq(a, b)
  *
  * Rationale: HOFs are CodegenFallback — per-row lambda interpretation
  * plus a materialized intermediate array. The native expressions run
  * the same left-to-right double accumulation as a fused loop, so the
  * rewrite is bit-exact (RewriteVectorHofsSpec asserts equality and
  * that the rewrite actually fires). Users keep writing the
  * declarative form; the optimizer picks the fast physical form —
  * the same philosophy as Catalyst's own expression rewrites.
  *
  * Injected by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule`.
  */
object RewriteVectorHofs extends Rule[LogicalPlan] {

  /** x cast to double (or already double) — returns the lambda var. */
  private object AsDouble {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
      case _ => None
    }
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case _ => false
  }

  /** finish lambda is identity: (acc) -> acc */
  private def isIdentityFinish(e: Expression): Boolean = e match {
    case LambdaFunction(v1: NamedLambdaVariable, Seq(v2: NamedLambdaVariable), _) =>
      v1.exprId == v2.exprId
    case _ => false
  }

  // containsNull tolerated: parquet list elements are nullable in the
  // schema even when no null ever occurs; the native expressions share
  // the HOF path's no-null-elements contract (VectorOps scaladoc).
  private def floatingArray(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // dot: aggregate(zip_with(a, b, (x, y) -> dbl(x) * dbl(y)), 0.0, (acc, e) -> acc + e)
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(AsDouble(x), AsDouble(y), _), Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(acc: NamedLambdaVariable, elem: NamedLambdaVariable, _), Seq(lacc: NamedLambdaVariable, lelem: NamedLambdaVariable), _),
          finish)
        if isZero(zero) && isIdentityFinish(finish) &&
          Set(x.exprId, y.exprId) == Set(lx.exprId, ly.exprId) &&
          acc.exprId == lacc.exprId && elem.exprId == lelem.exprId &&
          floatingArray(a) && floatingArray(b) =>
      ArrayDot(a, b)

    // l2Sq: aggregate(zip_with(a, b, (x, y) -> (dbl(x)-dbl(y))*(dbl(x)-dbl(y))), 0.0, +)
    case ArrayAggregate(
          ZipWith(a, b, LambdaFunction(
            Multiply(
              Subtract(AsDouble(x1), AsDouble(y1), _),
              Subtract(AsDouble(x2), AsDouble(y2), _), _),
            Seq(lx: NamedLambdaVariable, ly: NamedLambdaVariable), _)),
          zero,
          LambdaFunction(Add(acc: NamedLambdaVariable, elem: NamedLambdaVariable, _), Seq(lacc: NamedLambdaVariable, lelem: NamedLambdaVariable), _),
          finish)
        if isZero(zero) && isIdentityFinish(finish) &&
          x1.exprId == x2.exprId && y1.exprId == y2.exprId &&
          x1.exprId == lx.exprId && y1.exprId == ly.exprId &&
          acc.exprId == lacc.exprId && elem.exprId == lelem.exprId &&
          floatingArray(a) && floatingArray(b) =>
      ArrayL2Sq(a, b)

    // normSq: aggregate(a, 0.0, (acc, x) -> acc + dbl(x) * dbl(x))
    case ArrayAggregate(
          a,
          zero,
          LambdaFunction(Add(acc: NamedLambdaVariable, Multiply(AsDouble(x1), AsDouble(x2), _), _), Seq(lacc: NamedLambdaVariable, lx: NamedLambdaVariable), _),
          finish)
        if isZero(zero) && isIdentityFinish(finish) &&
          acc.exprId == lacc.exprId &&
          x1.exprId == lx.exprId && x2.exprId == lx.exprId &&
          floatingArray(a) =>
      ArrayNormSq(a)
  }
}
