package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  And, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual,
  Levenshtein, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (the `Rule[LogicalPlan]` tier of SURVEY §4.3, injected
  * through SparkSessionExtensions alongside the expressions): collapse
  * nested geometric roundings. geometric_round returns an integral double
  * and fixes integers (PropertySpec proves both), so g(g(x)) ≡ g(x) —
  * the nesting arises when composed pipelines round at a write boundary
  * and again at a read boundary (blend → round → export → round). The
  * rule runs in the operator-optimization fix-point, so arbitrary
  * nesting depth collapses to one application.
  */
object CollapseIdempotentRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GeometricRoundExpr(inner: GeometricRoundExpr) => inner
    }
}

/** Optimizer rule: bound edit-distance predicates get the banded DP.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic program
  * per row, then throws most of it away. Spark's thresholded form
  * `levenshtein(a, b, k)` runs the banded DP — O(k·min(|a|,|b|)) — and
  * returns -1 past the threshold, so for k ≥ 0:
  *
  *   lev(a,b) <= k  ⟺  lev(a,b,k) >= 0
  *   lev(a,b) <  k  ⟺  lev(a,b,k) >= 0 ∧ lev(a,b,k) < k
  *
  * Null semantics are preserved (both forms are null iff an input is
  * null). The rewrite is what q85 writes by hand; the rule grants it to
  * every user predicate, including SQL (`WHERE levenshtein(a,b) <= 3`).
  * In a fuzzy self-join at scale the per-pair DP is the entire query
  * cost, so this is the difference between O(k·len) and O(len²) per
  * candidate.
  */
object ThresholdLevenshtein extends Rule[LogicalPlan] {
  private def thresholded(a: Expression, b: Expression, k: Int): Expression =
    Levenshtein(a, b, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k >= 0 =>
        GreaterThanOrEqual(thresholded(a, b, k), Literal(0))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k >= 0 =>
        GreaterThanOrEqual(thresholded(a, b, k), Literal(0))
      // lev < k ⟺ lev ≤ k−1 ⟺ lev(a,b,k−1) ≥ 0: one banded evaluation
      // with a tighter band (the And(two thresholded forms) alternative
      // evaluates the DP twice per row — conjuncts don't reliably CSE)
      case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType)) if k > 0 =>
        GreaterThanOrEqual(thresholded(a, b, k - 1), Literal(0))
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None)) if k > 0 =>
        GreaterThanOrEqual(thresholded(a, b, k - 1), Literal(0))
    }
}
