package graft.plans

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{Abs, Add, And, AttributeReference,
  Cast, Divide, EqualTo, Expression, If, IsNotNull, Literal, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Codegen'd SMAPE aggregate — SURVEY §4.3's second named custom-Catalyst
  * candidate (the range-join rule was the first): `graft_smape(y, yhat)`
  * as a native DeclarativeAggregate, so the whole update/merge/evaluate
  * path is generated expression code inside whole-stage codegen and the
  * metric is first-class on the SQL surface
  * (`SELECT graft_smape(y, yhat) FROM ...`).
  *
  * The arithmetic is BITWISE-IDENTICAL to the Column composition it
  * complements — `avg(Metrics.smapeTerm(y, yhat))` (reference definition
  * kaggle/kaggle.py:109-131: |y−ŷ| / ((|y|+|ŷ|)/200) with the 0/0 → 0
  * guard) — including double accumulation order and null semantics (a
  * row with either side null contributes neither term nor count, exactly
  * like avg over a null-propagating term); NOTES invariant 8 (new custom
  * expressions must match the composition they replace bit-for-bit) is
  * spec-asserted with exact equality in PlansSpec.
  */
case class SmapeAgg(left: Expression, right: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def prettyName: String = "graft_smape"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == DoubleType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_smape needs (DOUBLE, DOUBLE), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  private lazy val sum = AttributeReference("sum", DoubleType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sum, cnt)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0L))

  // |y−ŷ| / ((|y|+|ŷ|)/200), 0/0 → 0 — Metrics.smapeTerm verbatim
  private def term: Expression = {
    val denom = Divide(Add(Abs(left), Abs(right)), Literal(200.0))
    If(EqualTo(denom, Literal(0.0)), Literal(0.0),
      Divide(Abs(Subtract(left, right)), denom))
  }

  override lazy val updateExpressions: Seq[Expression] = {
    val present = And(IsNotNull(left), IsNotNull(right))
    Seq(If(present, Add(sum, term), sum),
      If(present, Add(cnt, Literal(1L)), cnt))
  }

  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Add(sum.left, sum.right), Add(cnt.left, cnt.right))

  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType),
      Divide(sum, Cast(cnt, DoubleType)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SmapeAgg =
    copy(left = newLeft, right = newRight)
}
