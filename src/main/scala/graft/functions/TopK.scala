package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation (custom typed Aggregator, SURVEY §2.9 UDAF
  * row). The window idiom for top-n-per-group (row_number over
  * partitionBy) shuffles and sorts EVERY row of the fact table; this
  * aggregator keeps a k-element buffer per group, so partial aggregation
  * runs map-side and the shuffle carries at most k rows per (partition ×
  * group) — the same reduction map-side combine gives sums. At 100 TB
  * with low-cardinality groups that is the difference between shuffling
  * the table and shuffling kilobytes.
  *
  * Records order by (value desc, key1 asc, key2 asc) — a total order over
  * the carried fields, so results are deterministic for any input
  * partitioning (ties beyond the carried fields are exact duplicates and
  * interchangeable).
  */
object TopK {

  case class Rec(value: Double, key1: Long, key2: Int)

  private val ord: Ordering[Rec] =
    Ordering.by((r: Rec) => (-r.value, r.key1, r.key2))

  /** Top-k by descending value; buffer is a sorted Seq capped at k.
    * `reduce` rejects a non-improving record in O(1) — at a full buffer
    * the overwhelmingly common case at scale is "new record worse than
    * the current k-th", and re-sorting k+1 elements per input row made
    * the map-side pass O(rows·k log k) for no reason (review finding,
    * r14); only an improving record pays the O(k) insertion.
    */
  class TopKAgg(k: Int) extends Aggregator[Rec, Seq[Rec], Seq[Rec]] {
    override def zero: Seq[Rec] = Seq.empty
    override def reduce(b: Seq[Rec], a: Rec): Seq[Rec] =
      if (b.size >= k && ord.lteq(b.last, a)) b // b.last is the current k-th
      else {
        val i = b.indexWhere(r => ord.gt(r, a)) // buffer is always sorted
        val at = if (i < 0) b.size else i
        ((b.take(at) :+ a) ++ b.drop(at)).take(k)
      }
    override def merge(b1: Seq[Rec], b2: Seq[Rec]): Seq[Rec] =
      (b1 ++ b2).sorted(ord).take(k)
    override def finish(r: Seq[Rec]): Seq[Rec] = r.sorted(ord)
    override def bufferEncoder: Encoder[Seq[Rec]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Rec]]()
    override def outputEncoder: Encoder[Seq[Rec]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Rec]]()
  }

  /** Untyped column form for DataFrame groupBy.agg. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k))
}
