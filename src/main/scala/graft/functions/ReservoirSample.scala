package graft.functions

import scala.util.Random

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Single-pass per-group reservoir sampling as a custom typed Aggregator
  * (SURVEY.md §2.9's UDAF row). This is the 100 TB shape of "sample n per
  * group" (A1): one pass, O(k) state per group, map-side partial
  * aggregation — versus the ranking-window idiom (Sampling.perGroup) which
  * sorts every group.
  *
  * Determinism: reproducible for a fixed seed AND a fixed partitioning /
  * merge order (Algorithm R + weighted reservoir merge). Across different
  * partitionings the sample is still uniform, just a different draw —
  * inherent to single-pass sampling, and why the oracle-checked registry
  * uses the deterministic window variant instead.
  */
object ReservoirSample {

  case class Buf(count: Long, items: Seq[Double])

  class Agg(k: Int, seed: Long) extends Aggregator[Double, Buf, Seq[Double]] {
    private def rng(b: Buf): Random = new Random(seed ^ (b.count * 0x9e3779b97f4a7c15L))

    override def zero: Buf = Buf(0L, Vector.empty)

    override def reduce(b: Buf, x: Double): Buf = {
      val n = b.count + 1
      if (b.items.size < k) Buf(n, b.items :+ x)
      else {
        val j = math.floorMod(rng(b).nextLong(), n)
        if (j < k) Buf(n, b.items.updated(j.toInt, x)) else Buf(n, b.items)
      }
    }

    /** Weighted merge: draw each slot from either side with probability
      * proportional to its count (standard distributed-reservoir merge).
      */
    override def merge(a: Buf, b: Buf): Buf = {
      if (a.count == 0) return b
      if (b.count == 0) return a
      val total = a.count + b.count
      val r = new Random(seed ^ (total * 0xff51afd7ed558ccdL))
      var fromA = a.items.toBuffer
      var fromB = b.items.toBuffer
      val out = Vector.newBuilder[Double]
      val slots = math.min(k.toLong, total).toInt
      var (wa, wb) = (a.count.toDouble, b.count.toDouble)
      (0 until slots).foreach { _ =>
        val takeA = fromA.nonEmpty && (fromB.isEmpty || r.nextDouble() < wa / (wa + wb))
        if (takeA) { out += fromA.remove(fromA.size - 1); wa = math.max(0, wa - 1) }
        else { out += fromB.remove(fromB.size - 1); wb = math.max(0, wb - 1) }
      }
      Buf(total, out.result())
    }

    override def finish(b: Buf): Seq[Double] = b.items
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** DataFrame-facing column: reservoir_sample(col, k, seed). */
  def reservoir(c: Column, k: Int, seed: Long = 42L): Column =
    udaf(new Agg(k, seed)).apply(c)
}
