package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions entry point registering the library's native
  * expressions for SQL use (`SELECT geometric_round(x)`). Wire with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — done by
  * graft.Session — or spark.sql.extensions=graft.plans.GraftExtensions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("geometric_round"),
      new ExpressionInfo(classOf[GeometricRoundExpr].getName, "geometric_round"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GeometricRoundExpr(exprs.head)))
  }
}
