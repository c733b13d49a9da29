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
  * Shape for row_number / ntile — ONE full-data exchange, total:
  *
  *  1. `repartitionByRange(parts, order)` — the same shuffle any global
  *     orderBy pays; equal keys land in ONE partition (RangePartitioner
  *     resolves a key against the sampled bounds by binary search, so
  *     placement is a pure function of the key).
  *  2. `sortWithinPartitions(order)` — per-partition parallel sort, no
  *     movement.
  *  3. `monotonically_increasing_id()` — (partitionId << 33) + row
  *     offset in physical (= sorted) order, a pure projection. The
  *     partition index and the 1-based LOCAL row number are recovered
  *     by bit-splitting it; no window function runs at all. This
  *     matters: a `Window.partitionBy(pid)` here would NOT reuse the
  *     range layout — RangePartitioning never satisfies the window's
  *     ClusteredDistribution(pid), so Catalyst inserts a SECOND
  *     full-data hash exchange on pid (at most `parts` distinct keys
  *     spread by hash: collision skew on top of the extra shuffle).
  *     Found by plan audit; DistributedRankSpec now pins "exactly one
  *     exchange, and it is the range one" on the pre-checkpoint frame.
  *  4. the numbered frame is materialized ONCE with an eager
  *     `localCheckpoint` — load-bearing for correctness, not just
  *     lineage hygiene: the id column is partition-dependent, and each
  *     un-materialized instance of a range exchange samples its bounds
  *     with a seed derived from its own RDD id, so two instances of the
  *     same repartitionByRange in one plan can place boundary keys
  *     DIFFERENTLY (measured: offsets drift by a few ranks; exchange
  *     reuse sometimes hides it, but reuse is an optimization, never a
  *     guarantee). Checkpointing freezes one placement every consumer
  *     shares (NOTES invariant 16).
  *  5. per-partition row counts — ≤ `parts` rows AFTER map-side partial
  *     aggregation, bounded by CONFIG, not data — are cross-joined into
  *     exclusive prefix offsets plus the global total (a tiny broadcast
  *     nested-loop self-join rather than an unpartitioned window,
  *     precisely so no `Exchange SinglePartition` appears anywhere),
  *     then broadcast back and added to the local number.
  *
  * dense_rank is computed on the KEY DOMAIN instead: rank the DISTINCT
  * key frame (row_number ≡ dense_rank there) and hash-join it back —
  * dense rank is a property of the key, so the expensive ranking runs
  * on distinct keys only (the q85 comparison-dedup insight). When keys
  * repeat heavily (the dedup-pipeline case) the ranked side is tiny and
  * broadcasts; worst case (unique keys) it costs the distinct + the
  * join-back — still skew-free, still never single-partition.
  *
  * Correctness: equal-key co-location + in-partition sort make
  * `local row number + (rows in earlier partitions)` a global
  * row_number consistent with `order` — unique (hence deterministic)
  * iff `order` is a total order, the same contract the
  * single-partition form had. `ntile` derives the bucket from (global
  * row_number, total N) with the standard first-(N mod n)-buckets-get-
  * one-extra split, matching Spark's and DuckDB's NTile semantics
  * exactly, so every oracle that hash-verified against the window form
  * stays green unchanged. Row offsets fit 33 bits (8.6B rows per
  * partition) — size `parts` so partitions stay far under that.
  *
  * 100 TB shape: the range exchange distributes the sort across every
  * executor; the checkpoint persists partition-local (MEMORY_AND_DISK)
  * with no driver funnel; the counts frame is `parts` rows regardless
  * of data size; the auxiliary joins are broadcasts of ≤ `parts` rows.
  */
object DistributedRank {

  private val Mid = "__dr9_mid"
  private val Hd = "__dr9_hd"
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

  /** The pre-checkpoint numbered frame: range exchange + in-partition
    * sort + id projection. Exposed (test-only) so DistributedRankSpec
    * can assert the plan that the eager checkpoint in [[globalRowNumber]]
    * would otherwise hide: exactly ONE exchange, the range one.
    */
  private[graft] def localRankedForAudit(df: DataFrame, order: Seq[Column],
      parts: Int = -1): DataFrame =
    localNumbered(df, order, if (parts > 0) parts else defaultParts(df))

  /** [[rank]]'s pre-checkpoint frame — range exchange + sort + id
    * projection + the key-partitioned head/tie window. Exposed
    * (test-only) so DistributedRankSpec can pin the claim the method
    * exists for: the window plans ON the range layout, adding NO second
    * exchange and NO re-sort.
    */
  private[graft] def rankedHeadForAudit(df: DataFrame, keys: Seq[String],
      parts: Int = -1): DataFrame = {
    val kc = keys.map(col)
    val w = Window.partitionBy(kc: _*)
    localNumbered(df, kc, if (parts > 0) parts else defaultParts(df))
      .withColumn(Hd, min(col(Mid)).over(w))
      .withColumn("__dr9_gc", count(lit(1)).over(w))
  }

  private def localNumbered(df: DataFrame, order: Seq[Column], parts: Int): DataFrame =
    df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn(Mid, monotonically_increasing_id())

  /** (Pid, Off = exclusive prefix row count, Tot = global total) from a
    * (Pid, Cnt) per-partition count frame — ≤ `parts` rows, built by a
    * tiny broadcast cross self-join, precisely so no
    * `Exchange SinglePartition` window appears anywhere.
    */
  private def prefixOffsets(counts: DataFrame): DataFrame = {
    val mirror = counts.select(col(Pid).as(BPid), col(Cnt).as(BCnt))
    counts.join(broadcast(mirror), lit(true), "left")
      .groupBy(col(Pid))
      .agg(
        coalesce(sum(when(col(BPid) < col(Pid), col(BCnt)).otherwise(lit(0L))), lit(0L)).as(Off),
        coalesce(sum(col(BCnt)), lit(0L)).as(Tot))
  }

  /** df + `Gr` (1-based global row number, long) + `Tot` (row total). */
  private def globalRowNumber(df: DataFrame, order: Seq[Column], parts: Int): DataFrame = {
    // eager: every consumer below must see ONE frozen partition placement
    // (scaladoc item 4); also truncates lineage for iterative callers
    val snap = localNumbered(df, order, parts).localCheckpoint(true)
    val withPid = snap
      .withColumn(Pid, shiftrightunsigned(col(Mid), 33))
      .withColumn(Lr, col(Mid).bitwiseAND(lit((1L << 33) - 1)) + 1L)
      .drop(Mid)
    val counts = withPid.groupBy(col(Pid)).agg(count(lit(1)).as(Cnt))
    withPid.join(broadcast(prefixOffsets(counts)), Pid)
      .withColumn(Gr, col(Lr) + col(Off))
      .drop(Pid, Lr, Off)
  }

  /** Global row_number over `order` (must be total for a deterministic
    * result — ties within a partition are broken arbitrarily, exactly as
    * in the window form), as a LongType column `out`.
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String, parts: Int = -1): DataFrame =
    globalRowNumber(df, order, if (parts > 0) parts else defaultParts(df))
      .withColumnRenamed(Gr, out).drop(Tot)

  /** Global SQL RANK() over the named key columns, ASCENDING, as a
    * LongType column `out`: ties share the rank of the group's FIRST row
    * and gaps follow (1, 1, 3 — not dense_rank's 1, 1, 2). Keys must be
    * column NAMES, ascending; negate into a named column for descending
    * (the denseRank contract).
    *
    * Why it exists next to denseRank: rank() costs exactly ONE exchange
    * — the range one — with NO distinct and NO join-back. On top of the
    * range exchange + in-partition numbering, a window partitioned BY
    * THE KEYS computes each group's head id: RangePartitioning(keys)
    * satisfies the window's ClusteredDistribution(keys) (equal keys are
    * co-located by construction — a tie group never spans partitions),
    * so Catalyst plans the window WITHOUT a second exchange, directly on
    * the range layout; spec-pinned (DistributedRankSpec "rank plan"
    * via [[rankedHeadForAudit]]). The window must run BEFORE the eager
    * checkpoint (LogicalRDD under AQE drops the range partitioning, and
    * a post-checkpoint window would re-shuffle); the post-window
    * checkpoint then freezes one placement for the offsets join
    * (scaladoc item 4). The rank is the group head's global row number
    * (head local offset + broadcast partition prefix). Memory is
    * bounded by the largest tie group (WindowExec buffers one key group
    * at a time).
    *
    * This is the right primitive for ITERATIVE ranking (prefix
    * doubling, q260): each round only needs a tie-preserving
    * order-embedding of the key order — dense-ness buys nothing there
    * and costs denseRank's distinct + join-back. Bonus identity: when
    * every key is unique, rank() ≡ row_number ≡ dense_rank, so a
    * doubling ladder that terminates on uniqueness ends with DENSE
    * consecutive ranks automatically.
    *
    * Keys must not be float/double (loud require): Catalyst normalizes
    * NaN/-0.0 on window partition keys, and the wrapped clustering no
    * longer matches the raw-key range layout — snap to a decimal/long
    * grid first (the house canonicalization style).
    */
  def rank(df: DataFrame, keys: Seq[String], out: String, parts: Int = -1): DataFrame =
    rankImpl(df, keys, out, None, parts)

  /** [[rank]] plus `tieOut`: the size of each row's tie group (LongType)
    * from the same window pass, at zero extra plan cost — an iterative
    * caller's termination test (`max(tieOut) == 1` ⇔ keys unique ⇔ the
    * ranking is total AND dense) without a separate count-distinct job.
    */
  private[graft] def rankWithTieCount(df: DataFrame, keys: Seq[String], out: String,
      tieOut: String, parts: Int = -1): DataFrame =
    rankImpl(df, keys, out, Some(tieOut), parts)

  private def rankImpl(df: DataFrame, keys: Seq[String], out: String,
      tieOut: Option[String], parts0: Int): DataFrame = {
    // float/double keys: Catalyst wraps the window's partition keys in
    // NormalizeNaNAndZero, and the wrapped clustering no longer matches
    // the raw-key range layout — a second FULL-DATA hash exchange plans
    // and the one-exchange contract silently breaks. Refuse loudly; the
    // house style snaps floating quantities to decimal/long grids before
    // ranking anyway (Metrics.canonRound).
    // case-INSENSITIVE name match (follow-up review finding, r15): the
    // analyzer resolves the keys case-insensitively by default, so a
    // case-sensitive guard could be bypassed by "PRICE" vs "price" and
    // the silent second exchange would plan after all. Under a
    // case-sensitive session this over-matches — refusing too much is
    // the safe direction here.
    val floatKeys = df.schema.fields
      .filter(f => keys.exists(_.equalsIgnoreCase(f.name)))
      .filter(f => f.dataType == org.apache.spark.sql.types.DoubleType ||
        f.dataType == org.apache.spark.sql.types.FloatType)
    require(floatKeys.isEmpty,
      s"rank() keys must not be floating-point (got ${floatKeys.map(_.name).mkString(", ")}): " +
        "the float-normalization wrapper on window keys defeats the range-layout reuse — " +
        "snap to decimal/long first, or use denseRank/rowNumber")
    val parts = if (parts0 > 0) parts0 else defaultParts(df)
    val kc = keys.map(col)
    // The key window runs BEFORE the checkpoint, directly on the range
    // exchange: the planner sees RangePartitioning(keys) satisfying the
    // window's ClusteredDistribution(keys) (equal keys are co-located
    // and contiguous by construction — a tie group never spans
    // partitions) and the in-partition sort satisfying its ordering, so
    // neither a second exchange nor a re-sort plans. Checkpointing
    // FIRST would lose this: LogicalRDD under AQE does not carry the
    // range partitioning forward, and the window would re-shuffle the
    // full frame by key hash (measured, spec-pinned). The single
    // post-window checkpoint still freezes ONE partition placement for
    // both downstream consumers (scaladoc item 4 / NOTES invariant 16).
    val w = Window.partitionBy(kc: _*)
    val headed0 = localNumbered(df, kc, parts).withColumn(Hd, min(col(Mid)).over(w))
    val headed = tieOut.fold(headed0)(c => headed0.withColumn(c, count(lit(1)).over(w)))
      .localCheckpoint(true)
    // per-partition counts off the checkpoint (the window is
    // row-preserving, so these are the data counts)
    val counts = headed.select(shiftrightunsigned(col(Mid), 33).as(Pid))
      .groupBy(col(Pid)).agg(count(lit(1)).as(Cnt))
    headed
      .withColumn(Pid, shiftrightunsigned(col(Mid), 33))
      .drop(Mid)
      .join(broadcast(prefixOffsets(counts)), Pid)
      .withColumn(out, col(Hd).bitwiseAND(lit((1L << 33) - 1)) + 1L + col(Off))
      .drop(Pid, Hd, Off, Tot)
  }

  /** Global dense_rank over the named key columns, ASCENDING, as a
    * LongType column `out`. Keys must be column NAMES (not expressions):
    * the rank is computed on the distinct key frame and joined back on
    * exactly these columns. For a descending key, negate it into a
    * named column first. The join-back uses NULL-SAFE equality (`<=>`):
    * `distinct()` keeps one row per null-key combination and
    * `repartitionByRange` orders nulls FIRST ascending, so null keys
    * rank exactly as `dense_rank().over(Window.orderBy(keys))` would —
    * a plain using-columns join would silently DROP every null-key row
    * instead (review finding, r14; spec-pinned against the window form).
    *
    * ADAPTIVE: when the key domain is exactly the frame (every key
    * unique), dense_rank ≡ row_number and the whole distinct +
    * join-back is skipped (r14 verdict item 1) — the uniqueness test is
    * one combined count/count-distinct scan. Callers that only need a
    * TIE-PRESERVING ORDER-EMBEDDING (not dense-ness) should use
    * [[rank]] instead — one exchange, no distinct, no join-back at any
    * domain size.
    */
  def denseRank(df: DataFrame, keys: Seq[String], out: String, parts: Int = -1): DataFrame = {
    val kc = keys.map(col)
    // Adaptive unique-domain fast path (r14 verdict item 1): when the
    // key domain IS the frame, dense_rank ≡ row_number over the keys
    // (both are the position in key order; ties cannot exist), and the
    // distinct + join-back below is pure waste — the join-back alone
    // re-shuffles the FULL frame against a ranked side of the same
    // size. The test is ONE extra scan (count + exact count-distinct in
    // a single aggregation), cheap next to the join-back it can save —
    // though a caller whose input has expensive lineage should
    // materialize it first (this method evaluates `df` once more than
    // the r14 form did). count_distinct over a struct of the keys
    // matches distinct()'s row count exactly: the struct is never null,
    // so no row is excluded, and struct grouping is null-safe per
    // field — the same semantics the <=> join-back below encodes.
    val (n, nd) = {
      val r = df.agg(count(lit(1)), count_distinct(struct(kc: _*))).head
      (r.getLong(0), r.getLong(1))
    }
    if (nd == n) return rowNumber(df, kc, out, parts)
    val distinctKeys = df.select(kc: _*).distinct()
    val ranked = rowNumber(distinctKeys, kc, out, parts)
    // null-safe join-back: rename the ranked side's keys, match with <=>,
    // then drop the mirrors — semantically a USING join that also pairs
    // null keys (join keys are identical values by construction, so
    // either side's copy is the same column)
    val mirrored = keys.foldLeft(ranked)((r, k) => r.withColumnRenamed(k, s"__dr9_k_$k"))
    val cond = keys.map(k => col(k) <=> col(s"__dr9_k_$k")).reduce(_ && _)
    keys.foldLeft(df.join(mirrored, cond))((r, k) => r.drop(s"__dr9_k_$k"))
  }

  /** Global ntile(buckets) over `order` (total order required, as for
    * rowNumber), as an IntegerType column `out` — first (N mod buckets)
    * buckets hold ceil(N/buckets) rows, the rest floor(N/buckets), the
    * Spark/DuckDB NTile split.
    */
  def ntile(df: DataFrame, order: Seq[Column], buckets: Int, out: String,
      parts: Int = -1): DataFrame = {
    require(buckets >= 1, s"ntile buckets must be >= 1, got $buckets")
    val g = globalRowNumber(df, order, if (parts > 0) parts else defaultParts(df))
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
