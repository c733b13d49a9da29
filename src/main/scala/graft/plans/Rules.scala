package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

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
