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

    override def zero: Buf = Buf(0L, Vector.empty)

    override def reduce(b: Buf, x: Double): Buf = {
      val n = b.count + 1
      if (b.items.size < k) Buf(n, b.items :+ x)
      else {
        // the draw mixes the ELEMENT's bits, not just (seed, count): a
        // count-only seed made every group of the same size make the
        // identical positional accept/replace decisions — per-group
        // samples were perfectly correlated, not independent draws
        // (review finding, r14). Hashing the value keys each group's
        // sequence of decisions by its own content while staying fully
        // deterministic (the class contract).
        val h = scala.util.hashing.byteswap64(
          seed ^ java.lang.Double.doubleToLongBits(x) ^ (n * 0x9e3779b97f4a7c15L))
        val j = math.floorMod(h, n)
        if (j < k) Buf(n, b.items.updated(j.toInt, x)) else Buf(n, b.items)
      }
    }

    /** Weighted merge: draw each slot from either side with probability
      * proportional to its count (standard distributed-reservoir merge),
      * taking a RANDOM element of the chosen buffer — always taking the
      * tail made the drop set positional (each partition's earliest
      * insertions were systematically likelier to be discarded),
      * contradicting the uniformity claim (review finding, r14).
      */
    override def merge(a: Buf, b: Buf): Buf = {
      if (a.count == 0) return b
      if (b.count == 0) return a
      val total = a.count + b.count
      val mix = a.items.headOption.map(java.lang.Double.doubleToLongBits).getOrElse(0L) ^
        b.items.headOption.map(java.lang.Double.doubleToLongBits).getOrElse(0L)
      val r = new Random(seed ^ (total * 0xff51afd7ed558ccdL) ^ mix)
      val fromA = a.items.toBuffer
      val fromB = b.items.toBuffer
      val out = Vector.newBuilder[Double]
      val slots = math.min(k.toLong, total).toInt
      var (wa, wb) = (a.count.toDouble, b.count.toDouble)
      (0 until slots).foreach { _ =>
        val takeA = fromA.nonEmpty && (fromB.isEmpty || r.nextDouble() < wa / (wa + wb))
        if (takeA) { out += fromA.remove(r.nextInt(fromA.size)); wa = math.max(0, wa - 1) }
        else { out += fromB.remove(r.nextInt(fromB.size)); wb = math.max(0, wb - 1) }
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
