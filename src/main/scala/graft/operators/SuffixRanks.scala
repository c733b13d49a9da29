package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Distributed suffix-array construction by PREFIX DOUBLING
  * (Manber-Myers 1990), the real machinery behind ExactSubstr dedup
  * (Lee et al. 2022, arXiv:2107.06499) — where q119 approximates with
  * fixed 8-gram masking, this builds the actual suffix ordering and
  * reads MAXIMAL repeated substrings off it: rank all token suffixes of
  * the corpus, then the longest duplicated span through any position is
  * the LCP of rank-ADJACENT suffixes (the classic suffix-array/LCP
  * identity), so one pass over neighbors finds every maximal cross-doc
  * duplication with no pair enumeration.
  *
  * The algorithm, as dataflow: each doc's token array gets a unique
  * sentinel token appended ('~'||doc_id — '~' sorts above the corpus
  * alphabet, so no suffix is a prefix of another and all suffix ranks
  * are distinct); round 0 ranks positions by their single token (the
  * scale-correct seed — see the inline note on the rejected depth-4
  * variant); each later round ranks by the M-tuple of ranks at strides
  * M^k (r18 — log2(M) classic pair-doubling steps fused per rank pass;
  * see [[rankRound]]) — the lookups are windowed lead()s over positions
  * within the doc (suffixes never cross docs), null past the end → -1 —
  * and the loop exits early once every rank is distinct (Manber-Myers
  * termination; further rounds are exact no-ops). At most 4 rounds here
  * (fixture docs ≤ 100 tokens + sentinel ≤ 4^4 = 256; a require guards
  * the bound).
  *
  * Rank representation (r15): rounds use `DistributedRank.rank` — SQL
  * RANK(), tie-preserving but NOT dense — because prefix doubling only
  * needs an order-embedding that gives equal prefixes equal ranks;
  * dense-ness buys nothing mid-ladder and costs denseRank's distinct +
  * join-back every round (the r14 verdict's q260 item). The final
  * ranking is dense anyway, by identity: the ladder ends exactly when
  * every suffix's rank is unique (sentinel-guaranteed within the round
  * bound), and on unique keys RANK() degenerates to row_number — i.e.
  * consecutive 1..n — so the rank-adjacency join (r, r−1) below needs
  * no compaction pass. The tie-group size that `rankWithTieCount`
  * emits from the same window pass doubles as the termination test:
  * max(gc) == 1 ⇔ ranks total ⇔ this round's output is final.
  *
  * Oracle equivalence: DuckDB sorts the suffixes as SPACE-JOINED
  * strings — with every token char strictly between ' ' (the separator)
  * and '~' (the sentinel head), joined-string binary order is EXACTLY
  * token-sequence order, so both engines produce the same ranking; the
  * oracle then computes the same capped neighbor LCP with slice
  * equality. The output is the top-20 cross-doc duplications (lcp ≥ 8
  * tokens, capped at 32 — the dedup-decision threshold; the cap keeps
  * the LCP compare O(1) per neighbor) with the span's md5 as witness.
  *
  * Scale shape: each doubling round is one global RANK — routed through
  * `DistributedRank.rank` (range repartition + in-partition numbering +
  * a key-window head lookup planned ON the range layout + broadcast
  * offsets; see its scaladoc), so a round pays exactly TWO full-data
  * exchanges (the per-doc lead window's hash + the rank's range) and no
  * round plans an `Exchange SinglePartition` (DistributedRankSpec
  * captures a MID-round plan and pins this): O(n log L) total work, the
  * textbook parallel suffix-array bound. The LCP pass touches each
  * rank-adjacent pair exactly once: n-1 pairs, never n². At 100 TB each
  * round's shuffles spread over every executor, none single-partition,
  * and L (max doc length in tokens) bounds the round count at
  * ⌈log_M L⌉ ≈ 9 even for 100k-token docs.
  *
  * Alphabet guard: the oracle-equivalence argument requires every corpus
  * token char to sit strictly between ' ' (the join separator) and '~'
  * (the sentinel head), and no empty tokens (a double/leading/trailing
  * space would split one). A cheap corpus scan `require`s both, so a
  * fixture regeneration that breaks the assumption fails loudly instead
  * of as an oracle hash mismatch.
  */
object SuffixRanks {

  /** Rank-tuple width per round (r18): each round ranks by the M-tuple
    * (r[i], r[i+s], …, r[i+(M−1)s]) with stride s = M^k — log2(M)
    * classic doubling steps fused into ONE rank pass. The correctness
    * invariant is the textbook one, block-wise: after a round of
    * stride s the rank orders suffixes by their first min(M·s, len−i)
    * tokens (each tuple component is the depth-s rank of one
    * consecutive block; a block past the end reads −1, below every
    * real rank, so shorter suffixes sort first exactly as the pair
    * form's −1 did). The FINAL ranking — the only thing the output
    * reads — is the total suffix order, identical for any ladder path.
    * Why it pays: this corpus' injected duplicate spans have LCPs up
    * to ~32+ tokens, so the pair ladder genuinely runs all 7 rounds
    * (measured: the early exit never fires at sf0.1 — 99 jobs, 13.3s,
    * none over 1.7s: pure per-round job overhead); M = 4 runs the same
    * depth coverage in 4 rounds — 2 exchanges + 1 checkpoint fewer per
    * eliminated round — while the extra 2 lead columns ride the SAME
    * window pass (one Window operator, no extra exchange) and only
    * widen the range-shuffle row by 16 bytes.
    */
  private val M = 4
  private val Rounds = 4 // M^4 = 256 ≥ max doc tokens + sentinel
  private val LcpCap = 32
  private val MinLcp = 8

  /** One fused prefix-doubling round at stride M^k: window-lead the
    * ranks at offsets j·M^k (j = 1..M−1, −1 past the end) and re-rank
    * the M-tuples globally through `DistributedRank.rankWithTieCount` —
    * which is where the round's range shuffle, partition-local sort, and
    * eager checkpoint all live (ONE full-data exchange beyond the lead
    * window's; the r14 denseRank form paid the distinct + join-back on
    * top). Output adds `gc`, the tie-group size — `max(gc) == 1` is the
    * Manber-Myers termination test, read off the checkpointed frame
    * with no extra shuffle. Exposed so DistributedRankSpec can audit a
    * real mid-round frame (the r13 blind spot was the checkpoint hiding
    * the round's sorts from end-of-query plan audits; the helper's
    * `localRankedForAudit` exposes the pre-checkpoint plan itself).
    */
  def rankRound(ranked: org.apache.spark.sql.DataFrame, k: Int): org.apache.spark.sql.DataFrame = {
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val stride = { var s = 1; (0 until k).foreach(_ => s *= M); s }
    val paired = (1 until M).foldLeft(ranked.select("doc_id", "pos", "r")) {
      (acc, j) => acc.withColumn(s"rn$j",
        coalesce(lead(col("r"), j * stride).over(byPos), lit(-1L)))
    }
    DistributedRank.rankWithTieCount(paired,
        "r" +: (1 until M).map(j => s"rn$j"), "r2", "gc")
      .select(col("doc_id"), col("pos"), col("r2").as("r"), col("gc"))
  }

  val q260 = GQuery(
    "q260_suffix_ranks",
    (s, dir) => {
      val raw = Tables.documents(s, dir)
      // alphabet guard (see scaladoc): chars must stay in (' ', '~'),
      // no empty tokens from doubled/leading/trailing spaces
      val bad = raw.filter(col("text").rlike("(^ )|(  )|( $)|[^ -}]")).limit(1).count()
      require(bad == 0,
        "documents.text violates the suffix-rank alphabet contract " +
          "(char outside (' ','~') or an empty token) — oracle ordering identity breaks")
      val docs = raw
        .select(col("doc_id"),
          concat(TextQueries.tokens(col("text")),
            array(concat(lit("~"), col("doc_id").cast("string")))).as("toks"))
        .cache()
      val maxLen = docs.agg(max(size(col("toks")))).head.getInt(0)
      val cover = { var c = 1L; (0 until Rounds).foreach(_ => c *= M); c }
      require(maxLen <= cover,
        s"doc length $maxLen exceeds $M^$Rounds — raise Rounds")
      val positions = docs
        .select(col("doc_id"), posexplode(col("toks")).as(Seq("p0", "tok")))
        .select(col("doc_id"), (col("p0") + 1).cast("long").as("pos"), col("tok"))
      // Seed at depth 1 — the textbook choice, and the SCALE-correct
      // one: the seed rank's tie groups are the token VOCABULARY
      // (sublinear in the corpus), and every doubling round after it
      // ranks compact (long, long) pairs. A depth-4 seed (rank by the
      // 4-token window) was tried to shave two rounds: neutral at
      // sf0.1, but 1.6× SLOWER at 10× — a natural corpus has ~n
      // distinct 4-grams, so the wide-string seed rank dwarfs the two
      // long-pair rounds it saves. Measured, not guessed (ScaleCert
      // solo re-runs). rank() (not denseRank — see the scaladoc): the
      // ladder only needs tie-preserving order-embeddings.
      var ranked = DistributedRank.rank(positions, Seq("tok"), "r")
        .select("doc_id", "pos", "r")
      var k = 0
      var distinct = false
      while (k < Rounds && !distinct) {
        // No loop-level checkpoint (r15): rank() eagerly checkpoints its
        // post-window frame INTERNALLY, which already truncates each
        // round's lineage (NOTES invariant 14) — the only uncut suffix
        // is the bit-split + broadcast-offsets join, cheap to re-run and
        // deterministic off the frozen checkpoint (pid lives in the id
        // VALUE, not the runtime layout, so re-evaluation cannot drift —
        // invariant 16 does not bite). The denseRank-era loop checkpoint
        // was a second full materialization per round for nothing.
        ranked = rankRound(ranked, k)
        // Manber-Myers early termination: once every tie group is a
        // singleton (max gc == 1), r is a total order — AND, because
        // RANK() on unique keys is row_number, a dense consecutive
        // 1..n — so every further doubling round is an exact no-op and
        // the loop exits with the identical final frame. Real text
        // individuates suffixes after ~2-3 rounds; the 7-round cap is
        // the worst case. The check is one max() over the
        // just-checkpointed blocks — skipped on the last permitted
        // round, where its result cannot affect control flow (a corpus
        // that needs all rounds would otherwise pay one dead
        // full-frame scan per run).
        if (k + 1 < Rounds)
          distinct = ranked.agg(max(col("gc"))).head.getLong(0) == 1L
        k += 1
      }
      val a = ranked.select(col("r").as("rk"),
        col("doc_id").as("doc_a"), col("pos").as("pos_a"))
      val b = ranked.select((col("r") - 1).as("rk"),
        col("doc_id").as("doc_b"), col("pos").as("pos_b"))
      val adj = a.join(b, "rk")
        .join(broadcast(docs.select(col("doc_id").as("doc_a"), col("toks").as("a_toks"))), "doc_a")
        .join(broadcast(docs.select(col("doc_id").as("doc_b"), col("toks").as("b_toks"))), "doc_b")
      val sa = slice(col("a_toks"), col("pos_a").cast("int"), lit(LcpCap))
      val sb = slice(col("b_toks"), col("pos_b").cast("int"), lit(LcpCap))
      // leading-match count: zip (nulls pad the shorter → inequality),
      // then a prefix-scan fold that stops counting at the first miss
      val eqs = zip_with(sa, sb, (x, y) => coalesce(x === y, lit(false)))
      val lcp = aggregate(eqs,
        struct(lit(0).as("c"), lit(true).as("alive")),
        (st, e) => struct(
          (st.getField("c") + when(st.getField("alive") && e, 1).otherwise(0)).as("c"),
          (st.getField("alive") && e).as("alive")),
        st => st.getField("c"))
      adj.withColumn("lcp", lcp)
        .filter(col("lcp") >= MinLcp && col("doc_a") =!= col("doc_b"))
        .select(col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"),
          col("lcp").cast("int").as("lcp"),
          md5(array_join(slice(col("a_toks"), col("pos_a").cast("int"), col("lcp")), " "))
            .as("span_md5"))
        .orderBy(col("lcp").desc, col("doc_a"), col("pos_a"), col("doc_b"), col("pos_b"))
        .limit(20)
    },
    Some(s"""WITH d AS (
        SELECT doc_id,
               string_split(text, ' ') || ['~' || CAST(doc_id AS VARCHAR)] AS toks
        FROM documents),
      pos AS (
        SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, toks
        FROM d),
      suf AS (
        SELECT doc_id, pos, toks, array_to_string(toks[pos:], ' ') AS s
        FROM pos),
      r AS (SELECT doc_id, pos, toks, row_number() OVER (ORDER BY s) AS rk FROM suf),
      adj AS (
        SELECT a.doc_id AS doc_a, a.pos AS pos_a, a.toks AS a_toks,
               b.doc_id AS doc_b, b.pos AS pos_b, b.toks AS b_toks
        FROM r a JOIN r b ON b.rk = a.rk + 1),
      lcps AS (
        SELECT doc_a, pos_a, doc_b, pos_b, a_toks,
          coalesce((SELECT max(k) FROM range(1, ${LcpCap + 1}) t(k)
                    WHERE k <= least(len(a_toks) - pos_a + 1, len(b_toks) - pos_b + 1)
                      AND a_toks[pos_a : pos_a + k - 1] = b_toks[pos_b : pos_b + k - 1]), 0) AS lcp
        FROM adj)
      SELECT doc_a, pos_a, doc_b, pos_b, CAST(lcp AS INTEGER) AS lcp,
        md5(array_to_string(a_toks[pos_a : pos_a + lcp - 1], ' ')) AS span_md5
      FROM lcps
      WHERE lcp >= $MinLcp AND doc_a <> doc_b
      ORDER BY lcp DESC, doc_a, pos_a, doc_b, pos_b
      LIMIT 20"""))

  def all: Seq[GQuery] = Seq(q260)
}
