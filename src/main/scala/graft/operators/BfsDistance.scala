package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source BFS hop distance (the frontier-expansion half of any
  * shortest-path / reachability computation, e.g. Beamer 2012's
  * direction-optimizing BFS — public literature): given a seed set,
  * label every node with its hop distance to the NEAREST seed, up to a
  * fixed round budget; unreached nodes report -1. On a near-dup graph
  * this is "how many near-dup hops from a known-bad document" — the
  * contamination-blast-radius query; on a citation graph it is plain
  * reachability depth.
  *
  * Distributed shape per round: ONE equi join of the previous frontier
  * onto the cached edge list + one anti join against settled nodes —
  * monotone state (settled only grows), per-round localCheckpoint
  * truncates lineage, and integer-only state lets the oracle unroll
  * rounds as MATERIALIZED CTEs (the LubyMis/KCore pattern).
  */
object BfsDistance {

  /** @param nodes (vec_id)
    * @param edges (u, v) — symmetric
    * @param seeds (vec_id) ⊆ nodes
    * @return (vec_id, dist; -1 if unreached within `rounds`)
    */
  def distances(nodes: DataFrame, edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"BFS needs at least one round, got $rounds")
    val e = edges.select(col("u"), col("v")).cache()
    var settled = seeds.select(col("vec_id"), lit(0).as("dist")).localCheckpoint(true)
    var frontier = settled.select("vec_id")
    for (r <- 1 to rounds) {
      val next = e.join(frontier.select(col("vec_id").as("u")), "u")
        .select(col("v").as("vec_id")).distinct()
        .join(settled.select("vec_id"), Seq("vec_id"), "left_anti")
        .select(col("vec_id"), lit(r).as("dist"))
        .localCheckpoint(true)
      settled = settled.unionByName(next).localCheckpoint(true)
      frontier = next.select("vec_id")
    }
    val out = nodes.select(col("vec_id"))
      .join(settled, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("dist"), lit(-1)).cast("int").as("dist"))
      .orderBy("vec_id")
      .cache()
    out.count()
    e.unpersist()
    out
  }

  /** DuckDB twin over the q52/q133 near-dup graph (sample vec_id % 5 = 0,
    * rounded cosine > 0.25), seeds = vec_id % `seedMod` = 0, `rounds`
    * frontier expansions unrolled as MATERIALIZED CTEs.
    */
  def oracleSql(seedMod: Long, rounds: Int): String = {
    val rs = (1 to rounds).map { r =>
      val prev = s"f${r - 1}"
      s"""n$r AS MATERIALIZED (
        SELECT DISTINCT e.v AS vec_id FROM edges e JOIN $prev p ON p.vec_id = e.u),
      f$r AS MATERIALIZED (
        SELECT vec_id FROM n$r
        WHERE vec_id NOT IN (SELECT vec_id FROM s${r - 1})),
      s$r AS MATERIALIZED (
        SELECT vec_id, dist FROM s${r - 1}
        UNION ALL SELECT vec_id, $r AS dist FROM f$r)"""
    }.mkString(",\n      ")
    s"""WITH ${NearDupGraph.oracleCtes()},
      s0 AS MATERIALIZED (
        SELECT vec_id, 0 AS dist FROM d WHERE vec_id % $seedMod = 0),
      f0 AS MATERIALIZED (SELECT vec_id FROM s0),
      $rs
      SELECT n.vec_id, CAST(coalesce(s.dist, -1) AS INTEGER) AS dist
      FROM d n LEFT JOIN s$rounds s ON s.vec_id = n.vec_id
      ORDER BY n.vec_id"""
  }
}
