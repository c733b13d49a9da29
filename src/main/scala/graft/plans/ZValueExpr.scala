package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Morton (z-order) interleave of two 16-bit dimension codes — the data
  * CLUSTERING key behind multi-column file skipping (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`, Bayer's original UB-tree layout). Sorting a table
  * by `graft_zvalue(xCode, yCode)` before writing makes every output file's
  * bounding box tight in BOTH dimensions simultaneously, so min/max
  * footer stats prune files for predicates on either column — a
  * single-column sort only bounds one. At 100 TB this is the difference
  * between scanning one dimension's worth of files and scanning everything
  * for the second predicate.
  *
  * Semantics: take the low 16 bits of each non-negative int code; bit i of
  * `left` lands at result position 2i+1, bit i of `right` at 2i (left is
  * the "major" dimension). Callers rank/clamp raw values into the 16-bit
  * code space first (`ZOrderLayout` does, and documents the scale path).
  * Inputs outside [0, 65535] are masked, not errored — the interleave is a
  * layout hint, never a correctness gate. Null in → null out.
  *
  * The bit spread uses the classic magic-mask doubling (Morton 1966 via
  * the standard bit-twiddling form): 4 shift-or-mask steps per dimension,
  * fused into whole-stage codegen — the same "(b) custom Expression" tier
  * as `VectorExprs` (SURVEY.md §4.3). The DuckDB oracle reproduces the
  * interleave with 32 plain `(x//2^i)%2 * 2^p` terms (`ZOrderLayout
  * .interleaveSql`), so z-ordered layouts are hash-verifiable cross-engine.
  */
case class ZValueExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_zvalue"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (INT, INT), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  @inline private def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    (spread16(l.asInstanceOf[Int].toLong) << 1) | spread16(r.asInstanceOf[Int].toLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("zx")
      val y = ctx.freshName("zy")
      def spread(src: String, v: String): String =
        s"""
           |long $v = ((long) $src) & 0xffffL;
           |$v = ($v | ($v << 8)) & 0x00ff00ffL;
           |$v = ($v | ($v << 4)) & 0x0f0f0f0fL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;
         """.stripMargin
      s"""
         |${spread(a, x)}
         |${spread(b, y)}
         |${ev.value} = ($x << 1) | $y;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValueExpr =
    copy(left = l, right = r)
}

object ZValueExpr {
  /** Column-facing constructor via the function registry (GraftExtensions). */
  def zvalue(a: Column, b: Column): Column = call_function("graft_zvalue", a, b)
}
