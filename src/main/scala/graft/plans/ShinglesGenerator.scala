package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression (the Generator tier of the custom-Catalyst
  * surface, alongside scalar Expressions, the TopK/Reservoir Aggregators,
  * and the optimizer Rules): word-bigram shingles of a text column, one
  * output row per adjacent token pair.
  *
  * Semantically identical to `explode(bigrams(split(text, ' ')))` — same
  * regex-split, same ' '-joined pairs, empty for <2 tokens, no rows for
  * NULL text (oracle-compatibility is proved by q56/q83 still
  * hash-matching after the swap). What the fused form saves is the
  * intermediate work: the HOF composition materializes a token ARRAY,
  * then an interpreted `transform` builds a shingle ARRAY, then explode
  * walks it — this generator goes straight from the string to output
  * rows, one UTF8String concat per shingle, no per-document arrays.
  * Registered as `graft_shingles` (SQL: LATERAL VIEW compatible).
  */
case class ShinglesGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  private val space = UTF8String.fromString(" ")

  override def elementSchema: StructType =
    StructType(StructField("shingle", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs STRING, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      // same split semantics as the SQL split(text, ' ') the HOF path uses
      val toks = v.asInstanceOf[UTF8String].split(space, -1)
      if (toks.length < 2) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < toks.length - 1
        override def next(): InternalRow = {
          val r = InternalRow(UTF8String.concatWs(space, toks(i), toks(i + 1)))
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesGenerator =
    copy(child = newChild)
}
