package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point registering the library's native
  * expressions for SQL use (`SELECT geometric_round(x)`,
  * `SELECT graft_cosine(a, b)`). Wire with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — done by
  * graft.Session — or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def unary(e: SparkSessionExtensions, name: String, clazz: Class[_],
                    build: Seq[Expression] => Expression): Unit =
    e.injectFunction((
      new FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), build))

  override def apply(e: SparkSessionExtensions): Unit = {
    unary(e, "geometric_round", classOf[GeometricRoundExpr],
      exprs => GeometricRoundExpr(exprs.head))
    unary(e, "graft_dot", classOf[DotExpr],
      exprs => DotExpr(exprs(0), exprs(1)))
    unary(e, "graft_cosine", classOf[CosineSimExpr],
      exprs => CosineSimExpr(exprs(0), exprs(1)))
    unary(e, "graft_l2dist", classOf[L2DistExpr],
      exprs => L2DistExpr(exprs(0), exprs(1)))
    unary(e, "graft_eq_count", classOf[ArrayEqCountExpr],
      exprs => ArrayEqCountExpr(exprs(0), exprs(1)))
    e.injectOptimizerRule(_ => CollapseIdempotentRound)
  }
}
