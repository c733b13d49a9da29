package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Graph analytics over the BOUNDED near-dup edge source (r13 verdict
  * item 4; extended per r14 item 4): the r13 graph family
  * (q117/q122/q133/q151/q175/q176) builds its edges from threshold-0.25
  * all-pairs cosine — Θ(n²) by semantics, kept because those queries
  * certify the graph OPERATORS against oracles on a small sample. Their
  * scaladocs all name the LSH-banded pair stream as the 100 TB edge
  * source; these queries REGISTER that composition instead of merely
  * documenting it: PageRank (q261), label propagation (q262),
  * degree-ordered triangle counting (q266), and k-core peeling (q267),
  * all consuming `DedupQueries.dedupEdges` — the md5-MinHash → 4×2
  * banding → bucket-cap → signature-agreement pair pipeline that
  * q83/q227 cluster over. (q175 BFS / q176 HITS stay cosine-only by
  * design — the composition is now proven four ways, and their measured
  * 10× blowups are the smallest of the family.)
  *
  * Why this scales where the cosine family can't: banding generates
  * candidates per bucket (capped at 50), and the scale replicas' vocab
  * universes are disjoint, so edges grow LINEARLY with the corpus —
  * ScaleCert pins both rows ≤ ~3× at 10× data, versus the cosine
  * family's measured ~100× edge growth (adjudicated quadratic-by-
  * construction in PLANS.md). Everything is md5-anchored integers, so
  * the DuckDB oracle replays signatures, banding, the cap, the
  * agreement filter, and every graph round exactly (the q83 + q122/q133
  * oracle recipes composed).
  */
object GraphOnDedup {

  /** Shared oracle prefix: `DedupQueries.edgePipelineOracleCtes` (q83's
    * pair pipeline down to `good`) plus the symmetric `edges` CTE,
    * MATERIALIZED because the graph rounds reference it once per round.
    */
  private def edgeCtes: String =
    s"""${DedupQueries.edgePipelineOracleCtes()},
      edges AS MATERIALIZED (
        SELECT id_a AS u, id_b AS v FROM good
        UNION ALL SELECT id_b, id_a FROM good)"""

  /** The distinct banded pair stream (u < v). dedupEdges leaves
    * multi-band repeats in (CC dedups internally); every consumer here
    * is multiplicity-sensitive (degrees, votes, wedges, peel counts), so
    * the pair set is distinct-ed — one tiny shuffle of the (bounded)
    * edge list.
    */
  private def distinctPairs(s: org.apache.spark.sql.SparkSession, dir: String) =
    DedupQueries.dedupEdges(s, dir).distinct()

  /** Symmetric (u, v) edges from the distinct pair stream. */
  private def symEdges(pairs: org.apache.spark.sql.DataFrame) =
    pairs.unionByName(pairs.select(col("v").as("u"), col("u").as("v")))

  /** Near-dup centrality: which documents sit at the center of the
    * duplication structure (template hubs, boilerplate attractors) — the
    * ranking a curation pipeline uses to pick cluster survivors or to
    * audit template contamination. 10 PageRank rounds over the banded
    * edge set, nodes = documents with ≥ 1 near-dup edge.
    */
  val q261 = GQuery(
    "q261_pagerank_dedup",
    (s, dir) => {
      val edges = symEdges(distinctPairs(s, dir))
      PageRankOp.ranks(edges, rounds = 10)
        .select(col("vec_id").as("doc_id"),
          graft.functions.Metrics.canonRound(col("pr"), 6).as("pagerank"))
        .orderBy("doc_id")
    },
    Some {
      // rounds spliced from PageRankOp.oracleRoundCtes — the same
      // generator q122 uses, so the two oracles cannot drift apart
      s"""WITH $edgeCtes,
      ${PageRankOp.oracleRoundCtes(rounds = 10, idCol = "doc_id")}
      SELECT doc_id, floor(pr*1e6 + 0.5)/1e6 AS pagerank FROM pr10 ORDER BY doc_id"""
    })

  /** Sparse-label extension across the near-dup graph: every 4th doc is
    * "human-labeled" with its source; 3 majority-vote rounds push those
    * labels across near-dup edges (a doc sharing a template with a
    * labeled doc inherits its label) — how a curation pipeline names
    * dedup clusters from a handful of human labels. 'none' marks docs
    * propagation never reached.
    */
  val q262 = GQuery(
    "q262_labelprop_dedup",
    (s, dir) => {
      val edges = symEdges(distinctPairs(s, dir))
      val nodes = Tables.documents(s, dir).select(
        col("doc_id").as("vec_id"),
        when(col("doc_id") % 4 === 0, col("source")).as("seed_lbl"))
      LabelPropagation.propagate(nodes, edges, rounds = 3)
        .select(col("vec_id").as("doc_id"),
          coalesce(col("lbl"), lit("none")).as("label"),
          (col("vec_id") % 4 === 0).cast("int").as("is_seed"))
        .orderBy("doc_id")
    },
    Some {
      // rounds spliced from LabelPropagation.oracleRoundCtes — the same
      // generator q133's oracle uses, so the two cannot drift apart
      s"""WITH $edgeCtes,
      seeds AS MATERIALIZED (
        SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN source END AS seed_lbl
        FROM documents),
      ${LabelPropagation.oracleRoundCtes(rounds = 3, idCol = "doc_id")}
      SELECT doc_id, coalesce(lbl, 'none') AS label,
        CAST(doc_id % 4 = 0 AS INT) AS is_seed
      FROM l3 ORDER BY doc_id"""
    })

  /** Near-dup cluster DENSITY audit at scale (r14 verdict item 4):
    * q117's triangle semantics — triangles witness that near-dup pairs
    * close transitively, i.e. that CC survivor selection collapses real
    * cliques — but over the banded edge stream, and through the
    * DEGREE-ORDERED counting pipeline (operators.TriangleCount, the
    * O(m^1.5) wedge bound) rather than q117's id-ordered enumeration:
    * template hubs are exactly where Σ deg² would blow an id-ordered
    * wedge join up. Output = q243's report shape (top nodes by triangle
    * participation + clustering coefficients + the global audit).
    */
  val q266 = GQuery(
    "q266_triangles_dedup",
    (s, dir) => TriangleCount.reportFrom(distinctPairs(s, dir)),
    Some(TriangleCount.oracleSqlFrom(
      s"""${DedupQueries.edgePipelineOracleCtes()},
      e AS MATERIALIZED (SELECT id_a AS u, id_b AS v FROM good)""")))

  /** Density filtering at scale (r14 verdict item 4): q151's 3-core
    * semantics — survivors of iterative degree-3 peeling are template
    * farms, early peels are accidental pairs — but over the banded edge
    * stream and ALL documents (an edgeless doc peels in round 1 with
    * degree 0). Same `operators.KCore` engine and unrolled-round oracle
    * generator as q151, so the two cannot drift.
    */
  val q267 = GQuery(
    "q267_kcore_dedup",
    (s, dir) => {
      val nodes = Tables.documents(s, dir).select(col("doc_id").as("vec_id"))
      KCore.decompose(nodes, symEdges(distinctPairs(s, dir)), k = 3, rounds = 4)
        .withColumnRenamed("vec_id", "doc_id")
        .orderBy("doc_id")
    },
    Some(KCore.oracleSqlFrom(
      s"""$edgeCtes,
      live0 AS MATERIALIZED (SELECT doc_id AS vec_id FROM documents)""",
      k = 3, rounds = 4, idCol = "doc_id")))

  def all: Seq[GQuery] = Seq(q261, q262, q266, q267)
}
