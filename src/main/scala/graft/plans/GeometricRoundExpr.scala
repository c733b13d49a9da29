package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for geometric rounding
  * (kaggle/kaggle.py:837-842) with full whole-stage codegen — the
  * "promote hot Column helpers to Expression" path from SURVEY.md §4.3.
  * Semantically identical to Metrics.geometricRound (asserted in
  * PlansSpec); the win is a single fused java expression instead of a
  * when/sqrt/floor/ceil expression tree.
  */
case class GeometricRoundExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geometric_round needs DOUBLE, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    val f = math.floor(x); val c = math.ceil(x)
    if (x < math.sqrt(f * c)) f else c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val f = ctx.freshName("f")
      val c = ctx.freshName("c")
      s"""
         |double $f = Math.floor($x);
         |double $c = Math.ceil($x);
         |${ev.value} = ($x < Math.sqrt($f * $c)) ? $f : $c;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GeometricRoundExpr =
    copy(child = newChild)
}

object GeometricRoundExpr {
  /** Column-facing constructor — resolves through the function registry
    * (populated by GraftExtensions), the public-API route to a custom
    * Expression in Spark 4's unified Column world.
    */
  def geometricRoundNative(c: Column): Column =
    call_function("geometric_round", c)
}
