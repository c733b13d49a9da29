package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating expression for the line-level dedup family
  * (q188/q189): re-lines a document into (line_no, line) rows — a
  * boilerplate header at 0, the text's non-empty tokens grouped into
  * [[LinesGenerator.LineWords]]-word lines at 1..n, a boilerplate footer
  * at n+1 (pools selected by doc_id modulo pool size).
  *
  * Semantically identical to the HOF composition it replaces
  * (filter(split(text,' '), _ != '') → transform(sequence, slice →
  * concat_ws) → concat(header, ·, footer) → posexplode) — proved by
  * q188/q189 still hash-matching their unchanged DuckDB oracles after
  * the swap. What the fused form saves is DOUBLE evaluation plus
  * intermediate arrays: the optimizer pushes the generator's
  * non-empty/non-null guard into the scan filter, so the interpreted
  * HOF chain ran TWICE per document per side (filter + generate) and
  * materialized a token array, a line array, and a concat array each
  * time; this generator goes straight from the string to output rows.
  * Registered as `graft_lines(doc_id, text)`.
  */
case class LinesGenerator(docId: Expression, text: Expression)
    extends BinaryExpression with Generator with CodegenFallback {

  import LinesGenerator._

  override def left: Expression = docId
  override def right: Expression = text

  private val space = UTF8String.fromString(" ")

  override def elementSchema: StructType = StructType(
    StructField("line_no", IntegerType, nullable = false) ::
    StructField("line", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = (docId.dataType, text.dataType) match {
    case (LongType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"graft_lines needs (BIGINT, STRING), got (${a.catalogString}, ${b.catalogString})")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val idV = docId.eval(input)
    val textV = text.eval(input)
    if (idV == null || textV == null) Nil
    else {
      val id = idV.asInstanceOf[Long]
      // same split semantics as split(text, ' ', -1) with empties dropped
      val toks = textV.asInstanceOf[UTF8String].split(space, -1)
        .filter(_.numChars() > 0)
      val nl = (toks.length + LineWords - 1) / LineWords
      val rows = Seq.newBuilder[InternalRow]
      rows.sizeHint(nl + 2)
      // floorMod, not %: Scala % returns NEGATIVE remainders, so a
      // negative doc_id indexed the pool at -1 and killed the task
      // (review finding, r14)
      rows += InternalRow(0, HeaderPool(math.floorMod(id, HeaderPool.length.toLong).toInt))
      var g = 0
      while (g < nl) {
        val from = g * LineWords
        val window = java.util.Arrays.copyOfRange(
          toks, from, math.min(from + LineWords, toks.length))
        rows += InternalRow(g + 1, UTF8String.concatWs(space, window.toIndexedSeq: _*))
        g += 1
      }
      rows += InternalRow(nl + 1, FooterPool(math.floorMod(id, FooterPool.length.toLong).toInt))
      rows.result()
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LinesGenerator =
    copy(docId = newLeft, text = newRight)
}

object LinesGenerator {
  /** Content-line width (words) and the boilerplate pools — the single
    * source of truth shared with CurationQueries' oracles.
    */
  val LineWords = 8
  val Headers: Seq[String] = Seq(
    "subscribe to our newsletter for updates",
    "all rights reserved worldwide",
    "click here to accept all cookies",
    "sign in to continue reading",
    "share this article with your friends")
  val Footers: Seq[String] = Seq(
    "copyright twenty twenty four all rights reserved",
    "terms of service and privacy policy apply",
    "powered by the graft data engine",
    "back to top of the page")
  private val HeaderPool: Array[UTF8String] = Headers.map(UTF8String.fromString).toArray
  private val FooterPool: Array[UTF8String] = Footers.map(UTF8String.fromString).toArray
}
