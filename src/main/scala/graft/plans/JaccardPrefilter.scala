package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: size-ratio prefilter for Jaccard thresholds.
  *
  * The dedup verification filter has the canonical shape
  * `size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect(a,b))) >= t`.
  * Because `|a ∩ b| <= min(|a|,|b|)` and `|a ∪ b| >= max(|a|,|b|)`, a pair
  * can only pass when `min(|a|,|b|) >= t * max(|a|,|b|)`. This rule
  * prepends that O(1) length test as a conjunct, so the O(|a|+|b|)
  * intersection only runs on pairs that can still qualify — at 100 TB the
  * LSH candidate set is large and mostly non-duplicates, so this is the
  * verify stage's dominant cost.
  *
  * Soundness: the guard is a *necessary* condition of the original
  * predicate (never drops a qualifying row); on null arrays the combined
  * predicate still rejects the row exactly as the original does (whether
  * size(null) is null or the legacy -1). The rewrite
  * only fires on an exact top-level match and produces a shape that no
  * longer matches, so it is idempotent under the optimizer's fixed point.
  *
  * Registered via GraftExtensions (injectOptimizerRule) or
  * `spark.experimental.extraOptimizations`.
  */
object JaccardPrefilter extends Rule[LogicalPlan] {

  private object SizeOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case s: Size => Some(s.child)
      case _ => None
    }
  }

  private object CastToDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case c: Cast if c.dataType == DoubleType => Some(c.child)
      case _ => None
    }
  }

  /** matches the canonical jaccard >= threshold predicate — either the
    * HOF division form or the graft_jaccard kernel — returning
    * (a, b, threshold literal). Type coercion wraps the integer
    * denominator in a double cast (int/int division), so the denominator
    * pattern is Cast(Subtract(...)). */
  private object JaccardGte {
    def unapply(e: Expression): Option[(Expression, Expression, Literal)] = e match {
      case GreaterThanOrEqual(
            Divide(
              CastToDouble(SizeOf(ArrayIntersect(a1, b1))),
              CastToDouble(Subtract(Add(SizeOf(a2), SizeOf(b2), _), SizeOf(ArrayIntersect(a3, b3)), _)),
              _),
            t @ Literal(_, DoubleType))
          if a1.semanticEquals(a2) && a1.semanticEquals(a3) &&
            b1.semanticEquals(b2) && b1.semanticEquals(b3) =>
        Some((a1, b1, t))
      case GreaterThanOrEqual(
            graft.functions.JaccardExpr(a, b), t @ Literal(_, DoubleType)) =>
        Some((a, b, t))
      case _ => None
    }
  }

  private def dsize(e: Expression): Expression = Cast(Size(e), DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond @ JaccardGte(a, b, t), child) =>
      val guard = And(
        GreaterThanOrEqual(dsize(a), Multiply(t, dsize(b))),
        GreaterThanOrEqual(dsize(b), Multiply(t, dsize(a))))
      Filter(And(guard, cond), child)
  }
}
