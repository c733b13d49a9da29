package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Redirect-chain resolution by POINTER DOUBLING (pointer jumping — the
  * classic PRAM list-ranking primitive, Wyllie 1979; the dataflow form is
  * the standard "path doubling" join loop). Input: a successor relation
  * u → f(u) where some nodes are terminal (no out-edge). Output, per
  * node: the terminal its chain resolves to and the exact hop count, or a
  * loop verdict when the chain never reaches a terminal (redirect cycle).
  *
  * This is the crawl-curation stage after q192's URL canonicalization:
  * a real crawl graph is full of HTTP 301/302 chains, alias/symlink
  * hops, and genuine redirect LOOPS that a fetcher must detect rather
  * than follow forever. The naive per-node walk is O(chain length)
  * sequential steps; a 100 TB edge set with 10⁴-long chains would need
  * 10⁴ dependent joins. Doubling squares the stride instead: after round
  * k every node knows the node 2^k steps ahead (or its terminal, if
  * reached earlier), so ROUNDS = ceil(log2(longest chain)) — 13 joins
  * resolve any chain up to 8192 hops, each round one equi-join of the
  * state against itself on the jumped-to id (shuffle by id, no driver
  * state at all). The merge is associative bookkeeping: a finished state
  * absorbs nothing; an open state at p with h hops behind it splices the
  * state AT p and adds the hop counts.
  *
  * Per-round lineage is truncated with localCheckpoint (NOTES invariant
  * 14) — 13 stacked self-joins would otherwise replan the whole history
  * at every action.
  *
  * Reference behavior anchor: the reference has no graph surface at all
  * (kaggle/kaggle.py is tabular); this is north-star breadth — the
  * linked-structure complement of the BFS/CC family, covering the
  * "resolve chains of indirection" shape those message-passing loops
  * handle poorly (BFS from every node at once would be O(n·diameter)).
  */
object ChainResolve {

  /** Resolve every chain of `succ` (columns u, ptr — ptr null for
    * terminal nodes). Returns (u, status, final_id, hops):
    * status 'terminal' (u itself has no out-edge, hops 0),
    * 'resolved' (chain reaches a terminal in `hops` steps), or
    * 'loop' (no terminal within 2^rounds steps — with rounds ≥
    * log2(|V|) that is a proof of a cycle, not a timeout: a terminating
    * chain visits distinct nodes, so its length is < |V|).
    */
  def resolve(succ: DataFrame, rounds: Int): DataFrame = {
    // state: u, ptr (furthest known node on u's chain), hops (steps from
    // u to ptr), done (ptr is terminal). Terminal u: ptr = u, hops = 0.
    var state = succ.select(
      col("u"),
      coalesce(col("ptr"), col("u")).as("ptr"),
      when(col("ptr").isNull, lit(0L)).otherwise(lit(1L)).as("hops"),
      col("ptr").isNull.as("done"))
    // seed 'done' for nodes whose direct successor is already terminal.
    // NO broadcast hint: terminals are a constant FRACTION of the node
    // set (1/17 on the q204 graph), i.e. corpus-sized at 100 TB — this
    // is a shuffle equi-join by design; the planner may still broadcast
    // it at fixture scale on its own statistics.
    val term = succ.filter(col("ptr").isNull).select(col("u").as("t_id"))
    state = state
      .join(term, col("ptr") === col("t_id"), "left")
      .select(col("u"), col("ptr"), col("hops"),
        (col("done") || col("t_id").isNotNull).as("done"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val ahead = state.select(col("u").as("a_u"), col("ptr").as("a_ptr"),
        col("hops").as("a_hops"), col("done").as("a_done"))
      state = state.join(ahead, col("ptr") === col("a_u"), "left")
        .select(
          col("u"),
          when(col("done") || col("a_u").isNull, col("ptr"))
            .otherwise(col("a_ptr")).as("ptr"),
          when(col("done") || col("a_u").isNull, col("hops"))
            .otherwise(col("hops") + col("a_hops")).as("hops"),
          when(col("done"), lit(true))
            .otherwise(coalesce(col("a_done"), lit(false))).as("done"))
        .localCheckpoint(true)
    }
    state.select(
      col("u"),
      when(col("hops") === 0, lit("terminal"))
        .when(col("done"), lit("resolved"))
        .otherwise(lit("loop")).as("status"),
      when(col("done"), col("ptr")).as("final_id"),
      when(col("done"), col("hops")).as("hops"))
  }

  /** q204: synthetic redirect graph over documents — doc u redirects to
    * (37·u + 11) mod N unless u ≡ 0 (mod 17), which is terminal. The
    * affine map is measured to produce genuine redirect loops at every
    * fixture SF (26/36/24 looping docs at sf0.001/0.01/0.1, longest
    * terminating chain 79 hops) — both verdict branches are exercised.
    * 13 rounds cover chains to 8192 hops ≥ any terminating chain at
    * sf0.1 (|V| = 5000 bounds chain length; see resolve()).
    */
  val q204 = GQuery(
    "q204_chain_resolve",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val n = docs.count() // bounded driver scalar: one count, no data
      val succ = docs.select(
        col("doc_id").as("u"),
        when(col("doc_id") % 17 === 0, lit(null).cast("long"))
          .otherwise((col("doc_id") * 37 + 11) % n).as("ptr"))
      resolve(succ, rounds = 13)
        .withColumnRenamed("u", "doc_id")
        .orderBy("doc_id")
    },
    Some {
      // identical doubling, 13 unrolled MATERIALIZED rounds (NOTES
      // invariant 12). All-integer state: engine-exact.
      val r0 = """
      SELECT d.doc_id AS u,
             CASE WHEN d.doc_id % 17 = 0 THEN d.doc_id
                  ELSE (d.doc_id * 37 + 11) % c.n END AS ptr,
             CASE WHEN d.doc_id % 17 = 0 THEN 0 ELSE 1 END AS hops,
             (d.doc_id % 17 = 0 OR (d.doc_id * 37 + 11) % c.n % 17 = 0) AS done
      FROM documents d CROSS JOIN (SELECT count(*) AS n FROM documents) c"""
      val roundCtes = (1 to 13).map { k =>
        val (p, q) = (s"s${k - 1}", s"s$k")
        s"""$q AS MATERIALIZED (
        SELECT a.u,
               CASE WHEN a.done THEN a.ptr ELSE b.ptr END AS ptr,
               CASE WHEN a.done THEN a.hops ELSE a.hops + b.hops END AS hops,
               CASE WHEN a.done THEN TRUE ELSE b.done END AS done
        FROM $p a JOIN $p b ON a.ptr = b.u)"""
      }.mkString(",\n      ")
      s"""WITH s0 AS MATERIALIZED ($r0),
      $roundCtes
      SELECT u AS doc_id,
             CASE WHEN hops = 0 THEN 'terminal'
                  WHEN done THEN 'resolved' ELSE 'loop' END AS status,
             CASE WHEN done THEN ptr END AS final_id,
             CASE WHEN done THEN hops END AS hops
      FROM s13 ORDER BY doc_id"""
    })

  def all: Seq[GQuery] = Seq(q204)
}
