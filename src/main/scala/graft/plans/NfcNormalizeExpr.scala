package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression
  * (`graft_nfc`) — Spark ships no normalizer function, yet canonical
  * composition is the FIRST step of every text-dedup pipeline: the same
  * visible string in composed and decomposed form must hash identically
  * before any exact/MinHash/line-level stage sees it, or every
  * decomposed variant silently escapes deduplication.
  *
  * java.text.Normalizer implements the Unicode canonical-composition
  * algorithm, the same spec DuckDB's `nfc_normalize` implements, so the
  * output is cross-engine byte-identical (both produce the canonical
  * form defined by the UCD, not a library-specific variant). The JDK
  * call allocates one String per row; that is the cost of any correct
  * normalizer and stays inside whole-stage codegen with no boxing
  * beyond the unavoidable UTF8String↔String bridge.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_nfc needs STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($s.toString(), java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
