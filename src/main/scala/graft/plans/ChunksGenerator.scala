package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression for sliding-window document chunking
  * (q218's operator, fused — the `graft_lines`/`graft_shingles` tier):
  * one output row per `size`-token window at `stride`, `(chunk_id,
  * chunk)`, chunk k covering tokens [k·stride, k·stride+size) while
  * k·stride < n so every token lands in ≥1 chunk and the tail chunk may
  * run short.
  *
  * Semantically identical to the HOF composition
  * `posexplode(transform(sequence(0, floor((n-1)/stride)),
  * k -> array_join(slice(toks, k*stride+1, size), ' ')))` — same
  * single-space split, same short tail, one row for empty text (the
  * HOF's split('') = [''] behavior), no rows for NULL — proved by q218's
  * oracle still hash-matching after the swap plus the generator≡HOF
  * spec. What fusion saves: the HOF path materializes the token array,
  * an interpreted transform builds a chunk ARRAY per document, and
  * explode walks it; this goes string → output rows with one concatWs
  * per chunk and zero intermediate arrays. Registered as `graft_chunks`
  * (text, size, stride — both foldable INTs); LATERAL VIEW compatible.
  */
case class ChunksGenerator(child: Expression, winSize: Int, stride: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  // classed AnalysisException for SQL-surface value errors, matching the
  // arity/foldability/type errors GraftExtensions raises (r15 item 5)
  private def outOfRange(name: String, v: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "DATATYPE_MISMATCH.VALUE_OUT_OF_RANGE",
      messageParameters = Map(
        "sqlExpr" -> "\"graft_chunks\"", "exprName" -> s"`$name`",
        "valueRange" -> "[1, positive]", "currentValue" -> v.toString))
  if (winSize < 1) outOfRange("size", winSize)
  if (stride < 1) outOfRange("stride", stride)

  private val space = UTF8String.fromString(" ")

  override def elementSchema: StructType = StructType(
    StructField("chunk_id", IntegerType, nullable = false) ::
      StructField("chunk", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_chunks needs STRING, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val toks = v.asInstanceOf[UTF8String].split(space, -1)
      val n = toks.length // >= 1: split of "" yields [""], like the SQL path
      new Iterator[InternalRow] {
        private var k = 0
        override def hasNext: Boolean = k.toLong * stride < n
        override def next(): InternalRow = {
          val start = k * stride
          // NB: named winSize, not size — inside this anonymous Iterator a
          // bare `size` resolves to Iterator.size, which DRAINS the
          // iterator and recursed to a StackOverflowError on first run
          val len = math.min(winSize, n - start)
          val window = new Array[UTF8String](len)
          System.arraycopy(toks, start, window, 0, len)
          val r = InternalRow(k, UTF8String.concatWs(space, window: _*))
          k += 1
          r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ChunksGenerator =
    copy(child = newChild)
}
