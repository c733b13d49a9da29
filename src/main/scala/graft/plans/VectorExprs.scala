package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Whole-stage-codegen'd dense-vector kernels over ARRAY<DOUBLE> columns.
  *
  * Spark's higher-order functions (transform / zip_with / aggregate) are
  * CodegenFallback: every per-element lambda step allocates and boxes, and a
  * cosine composed from them costs ~8 interpreted array passes per row. On
  * the similarity workload (pairwise cosine over candidate pairs) that
  * interpretation overhead dominated the bench. These expressions fuse each
  * kernel into one primitive java loop inside WholeStageCodegen — the
  * "(b) custom Catalyst Expression" tier of the operator-preference ladder
  * (SURVEY.md §4.3).
  *
  * Numerics are BITWISE-identical to the HOF compositions they replace
  * (same left-to-right double accumulation, same null semantics: any null
  * element or length mismatch → null), so every DuckDB-oracle-checked query
  * that rounds these values keeps hashing identically.
  */
abstract class VectorFoldExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType

  // Can return null beyond input nullability (length mismatch, null
  // element), so the BinaryExpression default (left.nullable ||
  // right.nullable) under-reports: two non-nullable inputs (e.g. SQL
  // literal arrays) would codegen `boolean isNull = false;` as a final
  // and the interpreted path would NPE instead of yielding NULL.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (ARRAY<DOUBLE>, ARRAY<DOUBLE>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  /** Interpreted kernel; null on length mismatch / null element. */
  protected def fold(a: ArrayData, b: ArrayData): Any

  /** Java declarations of the accumulator variables; `acc` maps each
    * logical accumulator name to a ctx.freshName'd identifier so nested /
    * fused codegen contexts can never collide on `dot`/`na`/`ss`/… */
  protected def genInit(acc: String => String): String
  /** Java statements: given doubles x, y accumulate. */
  protected def genAccumulate(acc: String => String, x: String, y: String): String
  /** Java expression producing the final double from the accumulators. */
  protected def genResult(acc: String => String): String

  override def nullSafeEval(l: Any, r: Any): Any =
    fold(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val names = scala.collection.mutable.Map.empty[String, String]
      val acc: String => String = v => names.getOrElseUpdate(v, ctx.freshName(v))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${genInit(acc)}
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    ${genAccumulate(acc, x, y)}
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = ${genResult(acc)};
         |  }
         |}
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ, left-to-right. */
case class DotExpr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "graft_dot"
  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    dot
  }
  override protected def genInit(acc: String => String): String =
    s"double ${acc("dot")} = 0.0;"
  override protected def genAccumulate(acc: String => String, x: String, y: String): String =
    s"${acc("dot")} += $x * $y;"
  override protected def genResult(acc: String => String): String = acc("dot")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotExpr =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (√Σaᵢ² · √Σbᵢ²) — one fused pass. */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "graft_cosine"
  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def genInit(acc: String => String): String =
    s"double ${acc("dot")} = 0.0; double ${acc("na")} = 0.0; double ${acc("nb")} = 0.0;"
  override protected def genAccumulate(acc: String => String, x: String, y: String): String =
    s"${acc("dot")} += $x * $y; ${acc("na")} += $x * $x; ${acc("nb")} += $y * $y;"
  override protected def genResult(acc: String => String): String =
    s"${acc("dot")} / (Math.sqrt(${acc("na")}) * Math.sqrt(${acc("nb")}))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimExpr =
    copy(left = l, right = r)
}

/** eq_count(a, b) over ARRAY<LONG>: number of positions where aᵢ = bᵢ —
  * the MinHash signature-agreement kernel (estimated Jaccard = eq_count /
  * signature length). Replaces size(filter(zip_with(a,b,_===_), m => m)),
  * which walked the pair three times in interpreted mode. Null element or
  * length mismatch → null, matching the HOF composition.
  */
case class ArrayEqCountExpr(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def prettyName: String = "graft_eq_count"
  override def dataType: DataType = IntegerType
  // null on length mismatch / null element even for non-nullable inputs
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var c = 0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $c = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    if ($a.getLong($i) == $b.getLong($i)) $c++;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $c;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayEqCountExpr =
    copy(left = l, right = r)
}

/** l2dist(a, b) = √Σ(aᵢ−bᵢ)². */
case class L2DistExpr(left: Expression, right: Expression) extends VectorFoldExpr {
  override def prettyName: String = "graft_l2dist"
  override protected def fold(a: ArrayData, b: ArrayData): Any = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ss = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      ss += d * d
      i += 1
    }
    math.sqrt(ss)
  }
  override protected def genInit(acc: String => String): String =
    s"double ${acc("ss")} = 0.0;"
  override protected def genAccumulate(acc: String => String, x: String, y: String): String =
    s"double ${acc("d")} = $x - $y; ${acc("ss")} += ${acc("d")} * ${acc("d")};"
  override protected def genResult(acc: String => String): String =
    s"Math.sqrt(${acc("ss")})"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2DistExpr =
    copy(left = l, right = r)
}
