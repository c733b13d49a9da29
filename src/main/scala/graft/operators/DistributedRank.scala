package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL ranking — dense_rank / row_number / ntile over the
  * whole frame without the `Exchange SinglePartition` that a bare
  * `Window.orderBy(...)` (no partitionBy) plans. This is the shared
  * production-form helper the q95/q125/q147/q260 scaladocs used to only
  * describe; they now all route through it (r13 verdict item 1).
  *
  * Shape (one range shuffle, everything else bounded by config):
  *
  *  1. `repartitionByRange(parts, order)` — the same shuffle any global
  *     orderBy pays; equal keys land in ONE partition (RangePartitioner
  *     resolves a key against the sampled bounds by binary search, so
  *     placement is a pure function of the key).
  *  2. partition-LOCAL window ranks within each range slice (sort is
  *     per-partition, parallel across all `parts` tasks).
  *  3. the locally-ranked frame is materialized ONCE with an eager
  *     `localCheckpoint` — this is load-bearing for correctness, not
  *     just lineage hygiene: the partition-id column and the offset
  *     table both derive from it, and each un-materialized instance of
  *     a range exchange samples its bounds with a seed derived from its
  *     own RDD id, so two instances of the same repartitionByRange in
  *     one plan can place boundary keys DIFFERENTLY (measured: offsets
  *     drift by a few ranks; exchange reuse sometimes hides it, but
  *     reuse is an optimization, never a guarantee). Checkpointing
  *     freezes one placement that every consumer shares.
  *  4. per-partition rank counts — ≤ `parts` rows, bounded by CONFIG,
  *     not data — are cross-joined into exclusive prefix offsets plus
  *     the global total, then broadcast back and added to the local
  *     rank. The offsets come from a tiny broadcast nested-loop
  *     self-join rather than an unpartitioned window precisely so that
  *     NO `Exchange SinglePartition` appears anywhere (PlansSpec pins
  *     this on the pre-checkpoint frame via `localRankedForAudit` — the
  *     r13 audit blind spot was exactly a checkpoint hiding the sort).
  *
  * Correctness: equal-key co-location makes
  * `local dense_rank + (distinct keys in earlier partitions)` exactly
  * the global dense_rank, and `local row_number + (rows in earlier
  * partitions)` a global row_number consistent with `order` — unique
  * (hence deterministic) iff `order` is a total order, the same
  * contract the single-partition form had. `ntile` derives the bucket
  * from (global row_number, total N) with the standard first-(N mod n)
  * -buckets-get-one-extra split, matching Spark's and DuckDB's NTile
  * semantics exactly, so every oracle that hash-verified against the
  * window form stays green unchanged.
  *
  * 100 TB shape: the range exchange distributes the sort across every
  * executor; the checkpoint persists partition-local (MEMORY_AND_DISK)
  * with no driver funnel; the counts frame is `parts` rows regardless
  * of data size; the two auxiliary joins are broadcasts of ≤ `parts`
  * rows. One range shuffle + one materialization per call — the same
  * bill a global `orderBy.write` pays.
  */
object DistributedRank {

  private val Pid = "__dr9_pid"
  private val Lr = "__dr9_lr"
  private val Cnt = "__dr9_cnt"
  private val BPid = "__dr9_bpid"
  private val BCnt = "__dr9_bcnt"
  private val Off = "__dr9_off"
  private val Tot = "__dr9_tot"
  private val Gr = "__dr9_gr"

  private def defaultParts(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

  /** The pre-checkpoint ranked frame: range exchange + partition-local
    * window. Exposed (test-only) so PlansSpec can assert the plan that
    * the eager checkpoint in [[globalRank]] would otherwise hide.
    */
  private[graft] def localRankedForAudit(df: DataFrame, order: Seq[Column],
      parts: Int = -1): DataFrame =
    localRanked(df, order, if (parts > 0) parts else defaultParts(df),
      w => dense_rank().over(w))

  private def localRanked(df: DataFrame, order: Seq[Column], parts: Int,
      rank: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame =
    df.repartitionByRange(parts, order: _*)
      .withColumn(Pid, spark_partition_id())
      .withColumn(Lr, rank(Window.partitionBy(col(Pid)).orderBy(order: _*)).cast("long"))

  /** df + `Gr` (1-based global rank, long) + `Tot` (global rank total). */
  private def globalRank(df: DataFrame, order: Seq[Column], parts: Int,
      rank: org.apache.spark.sql.expressions.WindowSpec => Column): DataFrame = {
    // eager: every consumer below must see ONE frozen partition placement
    // (scaladoc item 3); also truncates lineage for iterative callers
    val snap = localRanked(df, order, parts, rank).localCheckpoint(true)
    val counts = snap.groupBy(col(Pid)).agg(max(col(Lr)).as(Cnt))
    val mirror = counts.select(col(Pid).as(BPid), col(Cnt).as(BCnt))
    val offs = counts.join(broadcast(mirror), lit(true), "left")
      .groupBy(col(Pid))
      .agg(
        coalesce(sum(when(col(BPid) < col(Pid), col(BCnt)).otherwise(lit(0L))), lit(0L)).as(Off),
        coalesce(sum(col(BCnt)), lit(0L)).as(Tot))
    snap.join(broadcast(offs), Pid)
      .withColumn(Gr, col(Lr) + col(Off))
      .drop(Pid, Lr, Off)
  }

  /** Global dense_rank over `order`, as a LongType column `out`. */
  def denseRank(df: DataFrame, order: Seq[Column], out: String, parts: Int = -1): DataFrame =
    globalRank(df, order, if (parts > 0) parts else defaultParts(df), w => dense_rank().over(w))
      .withColumnRenamed(Gr, out).drop(Tot)

  /** Global row_number over `order` (must be total for a deterministic
    * result — ties within a partition are broken arbitrarily, exactly as
    * in the window form), as a LongType column `out`.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String, parts: Int = -1): DataFrame =
    globalRank(df, order, if (parts > 0) parts else defaultParts(df), w => row_number().over(w))
      .withColumnRenamed(Gr, out).drop(Tot)

  /** Global ntile(buckets) over `order` (total order required, as for
    * rowNumber), as an IntegerType column `out` — first (N mod buckets)
    * buckets hold ceil(N/buckets) rows, the rest floor(N/buckets), the
    * Spark/DuckDB NTile split.
    */
  def ntile(df: DataFrame, order: Seq[Column], buckets: Int, out: String,
      parts: Int = -1): DataFrame = {
    require(buckets >= 1, s"ntile buckets must be >= 1, got $buckets")
    val g = globalRank(df, order, if (parts > 0) parts else defaultParts(df),
      w => row_number().over(w))
    // q = N div n, r = N mod n; rank <= (q+1)*r -> one of the r padded
    // buckets, else offset into the floor-sized tail. `div` (exact
    // integer division) keeps this lossless past 2^53 rows; greatest(q,1)
    // guards the (never-taken when q=0) tail branch against div-by-zero.
    g.withColumn("__dr9_q", expr(s"$Tot div $buckets"))
      .withColumn("__dr9_r", col(Tot) % buckets)
      .withColumn(out,
        when(col(Gr) <= (col("__dr9_q") + 1L) * col("__dr9_r"),
          expr(s"($Gr - 1) div (__dr9_q + 1) + 1"))
          .otherwise(expr(s"__dr9_r + ($Gr - __dr9_r * (__dr9_q + 1) - 1) div greatest(__dr9_q, 1L) + 1"))
          .cast("int"))
      .drop(Gr, Tot, "__dr9_q", "__dr9_r")
  }
}
