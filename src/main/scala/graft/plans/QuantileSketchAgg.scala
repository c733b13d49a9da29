package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{
  ArrayType, ByteType, DataType, DoubleType, IntegerType, LongType,
  NumericType, ShortType, StructField, StructType}

/** Mergeable quantile sketch — the percentile member of the sketch family
  * (HLL q27/q98 for distinct, Bloom q86 for membership, CMS q124 for
  * frequency, KMV q219 for overlap): a bounded bottom-k-by-hash sample of
  * (hash, value) pairs, kept as a Catalyst TypedImperativeAggregate so it
  * runs map-side-combined inside a normal hash aggregate and registers
  * for SQL through GraftExtensions.
  *
  * Design choice vs KLL/GK: those carry a better error-per-byte constant
  * but their compaction is ORDER-DEPENDENT — two runs (or two engines)
  * feeding rows in different orders produce different sketches, which is
  * fatal to this library's cross-engine verification discipline. The
  * bottom-k-by-hash sample is the DETERMINISTIC mergeable alternative
  * (Bar-Yossef et al. 2002's KMV machinery pointed at order statistics):
  * keeping the k pairs with the smallest (hash, value) is a uniform
  * random-but-reproducible sample of the distinct (hash, value)
  * population, the merge (k-min of union) is associative and commutative,
  * and the whole object — including quantile extraction as a plain order
  * statistic of the sampled values — replays exactly in DuckDB via
  * row_number() over the same md5-derived hash. Sampling error is the
  * standard O(1/√k) quantile-of-a-uniform-sample bound; the q225 report
  * carries an exact-audit column (the q139 recipe) so the error is
  * measured, not assumed.
  *
  * Why it matters at 100 TB: per-partition/per-grain sketches are ≤ k
  * rows each and merge WITHOUT touching raw data, so latency/length
  * percentile rollups recompute at any grain from sketch-sized inputs —
  * the q98 re-aggregability property, which percentile() itself
  * fundamentally lacks.
  *
  * The buffer is a sorted set of (hash, value) pairs — DISTINCT by
  * construction (a genuine duplicate pair carries no extra sample
  * information; callers wanting row multiplicity salt the hash with a
  * row id, as q225 does via the unique order key). NULL hash or value
  * rows are skipped, matching SQL aggregate convention.
  */
abstract class BottomKSketchBase
    extends TypedImperativeAggregate[mutable.TreeSet[(Long, Double)]] {

  def k: Int

  final override def createAggregationBuffer(): mutable.TreeSet[(Long, Double)] =
    mutable.TreeSet.empty[(Long, Double)]

  protected final def insert(buf: mutable.TreeSet[(Long, Double)],
                             pair: (Long, Double)): Unit = {
    buf.add(pair)
    if (buf.size > k) buf.remove(buf.last)
  }

  final override def merge(buf: mutable.TreeSet[(Long, Double)],
                           other: mutable.TreeSet[(Long, Double)])
      : mutable.TreeSet[(Long, Double)] = {
    other.foreach(insert(buf, _))
    buf
  }

  /** Sorted ascending by (h, v) — a deterministic array, so the sketch
    * itself (not only its quantiles) is hash-comparable cross-engine.
    */
  final override def eval(buf: mutable.TreeSet[(Long, Double)]): Any =
    new GenericArrayData(buf.toArray.map { case (h, v) =>
      InternalRow(h, v)
    }.asInstanceOf[Array[Any]])

  final override def serialize(buf: mutable.TreeSet[(Long, Double)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (h, v) => bb.putLong(h); bb.putDouble(v) }
    bb.array()
  }

  final override def deserialize(bytes: Array[Byte]): mutable.TreeSet[(Long, Double)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = mutable.TreeSet.empty[(Long, Double)]
    var i = 0
    while (i < n) { buf.add((bb.getLong, bb.getDouble)); i += 1 }
    buf
  }

  final override def nullable: Boolean = false
  final override def dataType: DataType = BottomKSketchBase.sketchType
}

object BottomKSketchBase {
  /** array<struct<h:bigint,v:double>>, ascending by (h, v), length ≤ k. */
  val sketchType: ArrayType = ArrayType(StructType(Seq(
    StructField("h", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false))), containsNull = false)
}

/** `graft_qsketch(hash, value, k)`: build the sketch from raw rows. */
case class QuantileSketchAgg(
    hashChild: Expression, valueChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends BottomKSketchBase {
  require(k > 0, "graft_qsketch: k must be positive")

  override def children: Seq[Expression] = Seq(hashChild, valueChild)

  // misuse fails at ANALYSIS, not as a runtime MatchError inside a task:
  // the hash must be integral (the 64-bit sampling key), the value any
  // numeric — exactly the set update() converts.
  override def checkInputDataTypes(): TypeCheckResult =
    (hashChild.dataType, valueChild.dataType) match {
      case (ByteType | ShortType | IntegerType | LongType, _: NumericType) =>
        TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"graft_qsketch requires (integral hash, numeric value), got " +
          s"(${h.catalogString}, ${v.catalogString})")
    }

  override def update(buf: mutable.TreeSet[(Long, Double)], input: InternalRow)
      : mutable.TreeSet[(Long, Double)] = {
    val h = hashChild.eval(input)
    val v = valueChild.eval(input)
    if (h != null && v != null) {
      val hv = h match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
      }
      val vv = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case d: org.apache.spark.sql.types.Decimal => d.toDouble
      }
      insert(buf, (hv, vv))
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchAgg =
    copy(hashChild = newChildren(0), valueChild = newChildren(1))
  override def prettyName: String = "graft_qsketch"
}

/** `graft_qsketch_merge(sketch, k)`: re-aggregate already-built sketches
  * to a coarser grain — the rollup face. k-min-of-union associativity
  * guarantees merge(sketch(A), sketch(B)) = sketch(A ∪ B) for any
  * partitioning (spec-pinned), so month sketches roll to quarters, years
  * and totals without re-reading raw data.
  */
case class QuantileSketchMergeAgg(
    sketchChild: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends BottomKSketchBase {
  require(k > 0, "graft_qsketch_merge: k must be positive")

  override def children: Seq[Expression] = Seq(sketchChild)

  // only a sketch built by graft_qsketch (array<struct<h:bigint,v:double>>)
  // merges; anything else is an analysis-time error.
  override def checkInputDataTypes(): TypeCheckResult =
    sketchChild.dataType match {
      case ArrayType(StructType(Array(
          StructField("h", LongType, _, _), StructField("v", DoubleType, _, _))), _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_qsketch_merge requires array<struct<h:bigint,v:double>> " +
          s"(a graft_qsketch result), got ${other.catalogString}")
    }

  override def update(buf: mutable.TreeSet[(Long, Double)], input: InternalRow)
      : mutable.TreeSet[(Long, Double)] = {
    val arr = sketchChild.eval(input)
    if (arr != null) {
      val ad = arr.asInstanceOf[ArrayData]
      var i = 0
      while (i < ad.numElements()) {
        val row = ad.getStruct(i, 2)
        insert(buf, (row.getLong(0), row.getDouble(1)))
        i += 1
      }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantileSketchMergeAgg =
    copy(sketchChild = newChildren(0))
  override def prettyName: String = "graft_qsketch_merge"
}
