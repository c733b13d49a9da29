package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a similarity graph (Zhu &
  * Ghahramani 2002, CMU-CALD-02-107 — public literature), synchronous and
  * fully deterministic: seed nodes stay clamped to their known label;
  * every round each non-seed takes the MAJORITY label among its labeled
  * neighbors from the previous round (tie-break: smallest label id), or
  * stays unlabeled if no neighbor is labeled yet. Labels therefore flow
  * outward from the seeds one hop per round — the standard way a dedup /
  * curation pipeline extends sparse human labels across a near-dup graph
  * (CC gives the clusters, propagation gives them names).
  *
  * Distributed shape per round: one equi join of the label frame onto the
  * cached symmetric edge list + one hash agg on (node, label) — integer
  * counts only, so unlike PageRank there is no float-accumulation concern
  * at all — then a row_number argmax and a left join back onto the seed
  * frame. Rounds are chained lineage over one cached edge list; a
  * many-round run would localCheckpoint every ~10 rounds, same as any
  * iterative DataFrame loop. Every quantity is integer or a clamped copy
  * of the input, so the DuckDB oracle replays all rounds as unrolled
  * MATERIALIZED CTEs (the q122/q126/q127 pattern).
  */
object LabelPropagation {

  /** @param nodes (vec_id, seed_lbl) — seed_lbl null on non-seeds
    * @param edges (u, v) — symmetric (both directions present)
    * @return (vec_id, lbl) — lbl null where propagation never reached
    */
  def propagate(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"label propagation needs at least one round, got $rounds")
    val seeds = nodes.select(col("vec_id"), col("seed_lbl")).cache()
    val e = edges.select(col("u"), col("v")).cache()
    var labels = seeds.select(col("vec_id"), col("seed_lbl").as("lbl"))
    for (_ <- 1 to rounds) {
      val nb = e.join(labels.select(col("vec_id").as("u_id"), col("lbl")),
          col("u") === col("u_id"))
        .filter(col("lbl").isNotNull)
        .groupBy(col("v").as("nid"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val win = Window.partitionBy("nid").orderBy(col("cnt").desc, col("lbl"))
      val prop = nb.withColumn("rk", row_number().over(win)).filter(col("rk") === 1)
        .select(col("nid"), col("lbl").as("prop_lbl"))
      labels = seeds.join(prop, col("vec_id") === col("nid"), "left")
        .select(col("vec_id"), coalesce(col("seed_lbl"), col("prop_lbl")).as("lbl"))
    }
    // materialize before dropping the loop caches (PageRankOp's cleanup)
    val out = labels.cache()
    out.count()
    e.unpersist()
    seeds.unpersist()
    out
  }

  /** The DuckDB twin of [[propagate]]'s round structure: `l0` plus
    * `rounds` unrolled majority-vote CTEs (nb/pp/l per round) over
    * PRECEDING `edges`(u, v) and `seeds`($idCol, seed_lbl) CTEs; the
    * final CTE is `l<rounds>`($idCol, lbl). The single generator q133
    * and q262 both splice in (same single-source discipline as
    * PageRankOp.oracleRoundCtes; review finding, r14).
    */
  def oracleRoundCtes(rounds: Int, idCol: String): String = {
    val rs = (1 to rounds).map { r =>
      s"""nb$r AS (SELECT e.v AS nid, l.lbl, count(*) AS cnt
        FROM edges e JOIN l${r - 1} l ON l.$idCol = e.u
        WHERE l.lbl IS NOT NULL GROUP BY 1, 2),
      pp$r AS (SELECT nid, lbl FROM (
        SELECT *, row_number() OVER (PARTITION BY nid ORDER BY cnt DESC, lbl) AS rk FROM nb$r)
        WHERE rk = 1),
      l$r AS MATERIALIZED (SELECT s.$idCol, coalesce(s.seed_lbl, p.lbl) AS lbl
        FROM seeds s LEFT JOIN pp$r p ON p.nid = s.$idCol)"""
    }.mkString(",\n      ")
    s"""l0 AS (SELECT $idCol, seed_lbl AS lbl FROM seeds),
      $rs"""
  }

  /** DuckDB twin over the q52 near-dup graph (embeddings sample
    * vec_id % 5 = 0, rounded cosine > 0.25) with seeds vec_id % `seedMod`
    * = 0: the same `rounds` majority-vote rounds unrolled as MATERIALIZED
    * CTEs.
    */
  def oracleSql(rounds: Int, seedMod: Int): String = {
    s"""WITH ${NearDupGraph.oracleCtes(withLabel = true)},
      seeds AS MATERIALIZED (SELECT vec_id,
        CASE WHEN vec_id % $seedMod = 0 THEN label END AS seed_lbl FROM d),
      ${oracleRoundCtes(rounds, "vec_id")}
      SELECT vec_id, CAST(coalesce(lbl, -1) AS INTEGER) AS label,
        CAST(CASE WHEN vec_id % $seedMod = 0 THEN 1 ELSE 0 END AS INTEGER) AS is_seed
      FROM l$rounds ORDER BY vec_id"""
  }
}
