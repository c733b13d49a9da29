package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_shingle_set(text)` → ARRAY<BIGINT>: the DISTINCT xxhash64 values
  * of a text's word-bigram shingles, computed row-locally in one pass.
  *
  * This fuses the set-similarity join's set-building stage
  * (`graft_shingles` generator → xxhash64 → groupBy collect_set), which
  * paid a full shuffle of every token row just to reassemble rows that
  * were already grouped — the per-document set is a pure function of the
  * document, so at any scale the shuffle is wasted data movement (at
  * sf0.1 it was ~40% of q87's wall). Bitwise-identical by construction:
  * same ' '-split, same concatWs windows as [[ShinglesGenerator]], and
  * the hash is Spark's own [[XxHash64Function]] at the xxhash64 SQL
  * function's default seed 42, so the q87 oracle keeps hash-matching
  * after the swap. Distinctness mirrors collect_set (element order is a
  * set contract either way). NULL text → NULL (the generator dropped the
  * row; an all-null set never survives explode, so downstream agrees).
  */
case class ShingleSetExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingle_set needs STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleSetExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row; the expression stays inside WholeStageCodegen
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleSetExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleSetExpr =
    copy(child = newChild)
}

object ShingleSetExpr {
  private val space = UTF8String.fromString(" ")

  def compute(text: UTF8String): ArrayData = {
    // same split semantics as ShinglesGenerator / split(text, ' ')
    val toks = text.split(space, -1)
    if (toks.length < 2) new GenericArrayData(Array.emptyLongArray)
    else {
      val seen = new java.util.HashSet[java.lang.Long](toks.length * 2)
      val out = new Array[Long](toks.length - 1)
      var k = 0
      var i = 0
      while (i <= toks.length - 2) {
        val sh = UTF8String.concatWs(space, toks(i), toks(i + 1))
        val h = XxHash64Function.hash(sh, StringType, 42L)
        if (seen.add(h)) { out(k) = h; k += 1 }
        i += 1
      }
      new GenericArrayData(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
    }
  }
}
