package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression (the Generator tier of the custom-Catalyst
  * surface, alongside scalar Expressions, the TopK/Reservoir Aggregators,
  * and the optimizer Rules): word n-gram shingles of a text column, one
  * output row per window of `n` adjacent tokens (default 2 = bigrams).
  *
  * Semantically identical to `explode(bigrams(split(text, ' ')))` (and,
  * for n > 2, to the PipelineQueries.ngrams HOF composition) — same
  * regex-split, same ' '-joined windows, empty for <n tokens, no rows for
  * NULL text (oracle-compatibility is proved by q56/q83 still
  * hash-matching after the swap). What the fused form saves is the
  * intermediate work: the HOF composition materializes a token ARRAY,
  * then an interpreted `transform` builds a shingle ARRAY, then explode
  * walks it — this generator goes straight from the string to output
  * rows, one UTF8String concat per shingle, no per-document arrays.
  * Registered as `graft_shingles` (1-arg bigram form) and `graft_ngrams`
  * (2-arg form, n a foldable literal); SQL LATERAL VIEW compatible.
  */
case class ShinglesGenerator(child: Expression, n: Int = 2)
    extends UnaryExpression with Generator with CodegenFallback {

  // AnalysisException, not require (r15 verdict item 5): the n parameter
  // arrives through the SQL surface (graft_ngrams(text, n)), and every
  // sibling parameter error on that surface — arity, non-foldable,
  // wrong-type (GraftExtensions) — raises a classed AnalysisException;
  // an IllegalArgumentException here was the one inconsistent texture.
  if (n < 2) throw new org.apache.spark.sql.AnalysisException(
    errorClass = "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE",
    messageParameters = Map(
      "sqlExpr" -> "\"graft_ngrams\"", "exprName" -> "`n`",
      "valueRange" -> "[2, positive]", "currentValue" -> n.toString))

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
      if (toks.length < n) Nil
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i <= toks.length - n
        override def next(): InternalRow = {
          val window = new Array[UTF8String](n)
          System.arraycopy(toks, i, window, 0, n)
          val r = InternalRow(UTF8String.concatWs(space, window: _*))
          i += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShinglesGenerator =
    copy(child = newChild)
}
