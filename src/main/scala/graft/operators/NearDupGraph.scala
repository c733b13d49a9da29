package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** SINGLE SOURCE for the q52/q133 near-dup graph the whole graph family
  * (q117 triangles, q122 PageRank, q133 label prop, q137 Luby MIS,
  * q151 k-core, q169 DBSCAN, q175 BFS, q176 HITS) is certified on: the
  * vec_id % 5 embedding sample, pairwise cosine > 0.25 (1e-6-rounded
  * compare), id_a < id_b. Eight queries and five oracle generators
  * previously inlined this predicate; a threshold / sample-rate /
  * rounding change now has exactly one home on EACH engine side
  * (review finding, r14 — missing one of thirteen hand-kept copies
  * would silently fork "the" graph the family claims to share).
  *
  * Scale note (adjudicated in PLANS.md "> 10× tail"): the pair join is
  * Θ(n²) BY SEMANTICS — this graph is the operators' certification
  * baseline on a sample; the 100 TB composition consumes the
  * LSH-banded pair stream instead (q261/q262 register it).
  */
object NearDupGraph {

  /** The vec_id % 5 sample, with whatever columns `e` carries. */
  def sample(e: DataFrame): DataFrame = e.filter(col("vec_id") % 5 === 0)

  /** Cosine-threshold pairs (id_a, id_b), id_a < id_b. */
  def pairs(e: DataFrame): DataFrame = {
    val d = sample(e)
    val a = d.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = d.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, col("id_a") < col("id_b"))
      .filter(graft.functions.Metrics.canonRound(
        VectorOps.cosine(col("va"), col("vb")), 6) > 0.25)
      .select("id_a", "id_b")
  }

  /** Symmetrized (u, v) edge list — both directions of every pair. */
  def edges(e: DataFrame): DataFrame = {
    val p = pairs(e)
    p.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionByName(p.select(col("id_b").as("u"), col("id_a").as("v")))
  }

  /** The DuckDB twin: `d` / `pairs` / `edges` CTEs (no WITH keyword —
    * callers splice). `d` carries emb (+ label when asked); `directed`
    * keeps edges in the low-id → high-id orientation (q176's HITS)
    * instead of symmetrizing.
    */
  def oracleCtes(withLabel: Boolean = false, directed: Boolean = false): String = {
    val lbl = if (withLabel) ", label" else ""
    val edgesSql =
      if (directed) "SELECT id_a AS u, id_b AS v FROM pairs"
      else
        """SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs"""
    s"""d AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb$lbl
        FROM embeddings WHERE vec_id % 5 = 0),
      pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM d a JOIN d b ON a.vec_id < b.vec_id
        WHERE floor(list_cosine_similarity(a.emb, b.emb)*1e6 + 0.5)/1e6 > 0.25),
      edges AS MATERIALIZED ($edgesSql)"""
  }
}
