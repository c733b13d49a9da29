package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Weighted sampling without replacement via PRIORITY SAMPLING
  * (Duffield, Lund, Thorup 2007, "Priority sampling for estimation of
  * arbitrary subset sums" — public literature): each item draws a
  * uniform u ∈ (0,1), its priority is q = w/u, the sample is the k
  * largest priorities, and the threshold τ (the (k+1)-th priority)
  * yields the unbiased per-item weight estimator ŵ = max(w, τ) —
  * E[Σ_sample ŵ] equals the exact total weight, which is what makes a
  * tiny weighted sample usable for downstream subset-sum questions
  * ("how many training tokens does this slice hold") without rescanning
  * the corpus. The curation registry's sampling family so far is
  * uniform (q08 per-group, q88 stratified, reservoir in ReservoirSample);
  * this is its WEIGHTED member — sampling documents proportionally to
  * length is how a token-budgeted pipeline picks representative docs.
  *
  * Cross-engine determinism, with NO snapping in the ordering: u is the
  * q56-scheme 60-bit md5 hash of (doc_id:text) divided by 2^60, so the
  * priority w·2^60/h is built from int→double casts, one multiply and
  * one divide — all IEEE-754 operations both engines evaluate
  * bit-identically (only libm transcendentals differ cross-engine; the
  * classic exponential-race form -ln(u)/w would NOT replay exactly,
  * which is why the rational DLT priority is the right formulation
  * here, not just a stylistic choice). Ties broken by doc_id.
  *
  * Scale shape: the sample is computed by the bounded-heap TopK
  * Aggregator (functions.TopK) holding k+1 records per group, so
  * partial aggregation runs map-side and the shuffle carries at most
  * (k+1)·partitions rows per group — the corpus is scanned once and
  * never sorted (the window form would shuffle+sort every row). The
  * join back for weights broadcasts the k·|groups|-row sample against
  * the column-pruned scan; τ and the per-group audit totals are
  * broadcast scalar frames. Nothing grows super-linearly with the
  * corpus; the exact_total audit column is one extra map-side-combined
  * agg over the same scan.
  */
object WeightedSample {

  private val K = 16
  // 2^60, exact in double (power of two); h/2^60 ∈ (0,1] is the uniform
  // position of the 60-bit md5 hash
  private val Pow60 = 1.152921504606846976e18

  /** Row-local priorities (lang, prio, doc_id) — a pure function of each
    * row, so any slicing of the corpus yields the same priority set
    * (what makes the streaming twin q233 exact).
    */
  def priorities(docs: DataFrame): DataFrame = {
    val prio = col("n_chars").cast("double") * lit(Pow60) /
      conv(substring(md5(concat_ws(":", col("doc_id"), col("text"))), 1, 15), 16, 10)
        .cast("long").cast("double")
    docs.select(col("lang"), prio.as("prio"), col("doc_id"))
  }

  /** Per-group top-(k+1) priority state via the bounded heap — k sample
    * slots plus the threshold row. Top-(k+1) of a union of top-(k+1)s
    * equals top-(k+1) of the union (associative + commutative), so this
    * is also the streaming merge step.
    */
  def topState(rows: DataFrame, k: Int = K): DataFrame = {
    val topk = graft.functions.TopK.topK(k + 1)
    // NO distinct here: it would shuffle every row before the heap and
    // defeat the map-side combine. Row uniqueness is the caller's
    // invariant (doc_id is unique; the streaming merge's replay guard
    // prevents double delivery).
    rows
      .groupBy("lang")
      .agg(topk(col("prio"), col("doc_id"), lit(0)).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rk"),
        col("r.key1").as("doc_id"), col("r.value").as("prio"))
  }

  /** Per-group (lang) priority sample of documents weighted by n_chars:
    * one row per sampled doc with its rank, priority, DLT estimator
    * ŵ = max(w, τ), and the per-group audit totals (estimated vs exact).
    * Groups with ≤ k docs are fully sampled (τ absent ⇒ ŵ = w, the
    * DLT exhaustive case — every fixture lang exceeds k at every SF,
    * so the spec exercises that branch on a thinned frame).
    */
  def prioritySample(docs: DataFrame, k: Int = K): DataFrame =
    report(topState(priorities(docs), k), docs, k)

  /** Final report from the ranked top-(k+1) state: the audit totals are
    * dimension lookups against the corpus (shared by batch q229 and the
    * streaming q233, which differ only in how the state was built).
    */
  def report(rankedIn: DataFrame, docs: DataFrame, k: Int = K): DataFrame = {
    // the ranked state is only (k+1)·|groups| rows but its subtree scans
    // and md5-hashes the whole corpus, and it feeds tau, the sample, AND
    // the estimator total — cache it or the hashing scan runs three
    // times (plan-audited; a ≤ hundred-row cache needs no unpersist)
    val ranked = rankedIn.cache()
    val tau = ranked.filter(col("rk") === k + 1)
      .select(col("lang"), col("prio").as("tau"))
    val weights = docs.select(col("doc_id"), col("n_chars").as("w"))
    // broadcast the SAMPLE side: weights is the corpus-sized side at
    // scale (fixture stats would happily broadcast it instead)
    val sample = broadcast(ranked.filter(col("rk") <= k)
        .join(broadcast(tau), Seq("lang"), "left"))
      .join(weights, Seq("doc_id"))
      .withColumn("w_hat",
        greatest(col("w").cast("double"), coalesce(col("tau"), lit(0.0))))
    val est = sample.groupBy("lang").agg(Metrics.exactSum(col("w_hat")).as("est_total"))
    val exact = docs.groupBy("lang").agg(sum("n_chars").as("exact_total"))
    sample
      .join(broadcast(est), Seq("lang"))
      .join(broadcast(exact), Seq("lang"))
      .select(col("lang"), col("rk"), col("doc_id"), col("w"),
        Metrics.canonRound(col("prio"), 4).as("prio_r"),
        Metrics.canonRound(col("w_hat"), 4).as("w_hat_r"),
        col("est_total"), col("exact_total"))
      .orderBy("lang", "rk")
  }

  val q229 = GQuery(
    "q229_priority_sample",
    (s, dir) => prioritySample(Tables.documents(s, dir)),
    Some("""WITH pr AS (
        SELECT lang, doc_id, n_chars AS w,
          CAST(n_chars AS DOUBLE) * 1152921504606846976.0 /
            CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 15))
                 AS BIGINT) AS DOUBLE) AS prio
        FROM documents),
      rkd AS (
        SELECT lang, doc_id, w, prio,
          row_number() OVER (PARTITION BY lang ORDER BY prio DESC, doc_id) AS rk
        FROM pr),
      tau AS (SELECT lang, prio AS tau FROM rkd WHERE rk = 17),
      samp AS (
        SELECT r.lang, r.rk, r.doc_id, r.w, r.prio,
          greatest(CAST(r.w AS DOUBLE), coalesce(t.tau, 0.0)) AS w_hat
        FROM rkd r LEFT JOIN tau t ON t.lang = r.lang
        WHERE r.rk <= 16),
      est AS (
        SELECT lang,
          CAST(sum(CAST(floor((w_hat)*1e4+0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)
            AS est_total
        FROM samp GROUP BY lang),
      tot AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS exact_total
              FROM documents GROUP BY lang)
      SELECT s.lang, CAST(s.rk AS INTEGER) AS rk, s.doc_id, s.w,
        floor((s.prio)*1e4+0.5)/1e4 AS prio_r,
        floor((s.w_hat)*1e4+0.5)/1e4 AS w_hat_r,
        e.est_total, t.exact_total
      FROM samp s
      JOIN est e ON e.lang = s.lang
      JOIN tot t ON t.lang = s.lang
      ORDER BY s.lang, s.rk"""))

  /** Streaming twin: the per-lang top-(k+1) state maintained across
    * three genuine micro-batches (streaming.SampleStreams); merge
    * associativity makes the final state — and so the whole report —
    * equal the batch build for any slicing, which is why this entry
    * reuses q229's oracle VERBATIM.
    */
  val q233 = GQuery(
    "q233_streaming_priority_sample",
    (s, dir) => graft.streaming.SampleStreams.streamingPrioritySample(s, dir),
    q229.oracle)

  val all: Seq[GQuery] = Seq(q229, q233)
}
