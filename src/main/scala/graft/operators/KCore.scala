package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Seidman 1983, "Network
  * structure and minimum degree" — public literature): repeatedly remove
  * every node whose CURRENT degree is below k; what survives is the
  * k-core, the standard density filter on near-dup / citation / link
  * graphs (a dedup cluster that survives the 3-core is a template farm,
  * not a coincidence; a node peeled in round 1 is an isolated accident).
  *
  * Output tags every node with its fate: `in_core` = 1 for survivors,
  * else the 1-based round it was peeled in — the peel round is itself a
  * centrality-ish signal (later peel = closer to the dense core). With
  * fixed `rounds` the result is deterministic whether or not the peel has
  * converged: any node still standing after R rounds reports in_core 1,
  * exactly like LubyMis's 'active' convention, and the oracle replays the
  * same R rounds so the two can never disagree about convergence.
  *
  * Distributed shape per round: one hash agg on u over the live edge
  * frame (degree), one anti-join to drop peeled nodes' edges — the same
  * monotone Pregel-as-SQL round as LubyMis (state only shrinks), which is
  * what lets the oracle unroll rounds as MATERIALIZED CTEs carrying only
  * the live node set. Per-round `localCheckpoint(true)` truncates the
  * iterative lineage (the AQE cached-exchange rule — see NOTES).
  */
object KCore {

  /** @param nodes (vec_id)
    * @param edges (u, v) — symmetric, no self-loops
    * @return (vec_id, in_core ∈ 0|1, peel_round; -1 for core members)
    */
  def decompose(nodes: DataFrame, edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k-core needs k >= 1, got $k")
    require(rounds >= 1, s"k-core needs at least one round, got $rounds")
    var live = nodes.select(col("vec_id")).localCheckpoint(true)
    // restrict to edges with BOTH endpoints in the node set (review
    // finding, r15): an edge frame drawn from a superset of `nodes`
    // would otherwise inflate round-1 degrees with out-of-set
    // neighbors — surviving a peel the documented semantics (and the
    // oracle, which filters deg1 by live0 on both ends) say should
    // happen. LEFT SEMI joins specifically (follow-up review finding):
    // an inner join against a node frame holding duplicate vec_ids
    // would MULTIPLY the incident edges and inflate degrees the other
    // way. All current callers pass in-set, duplicate-free inputs, so
    // outputs are unchanged.
    var liveEdges = edges.select(col("u"), col("v"))
      .join(live.select(col("vec_id").as("u")), Seq("u"), "left_semi")
      .join(live.select(col("vec_id").as("v")), Seq("v"), "left_semi")
      .select(col("u"), col("v"))
      .localCheckpoint(true)
    var peeled: DataFrame = null
    for (r <- 1 to rounds) {
      val deg = liveEdges.groupBy("u").agg(count(lit(1)).as("deg"))
        .withColumnRenamed("u", "vec_id")
      // nodes below k: missing from the edge frame means degree 0
      val peelR = live.join(deg, Seq("vec_id"), "left")
        .filter(coalesce(col("deg"), lit(0L)) < k)
        .select(col("vec_id"), lit(r).as("peel_round"))
        .localCheckpoint(true)
      peeled = if (peeled == null) peelR else peeled.unionByName(peelR)
      live = live.join(peelR.select("vec_id"), Seq("vec_id"), "left_anti")
        .localCheckpoint(true)
      // left_semi for the same duplicate-proofing reason as the init
      // filter above (and it is the cheaper plan: no output columns
      // from the build side)
      liveEdges = liveEdges
        .join(live.select(col("vec_id").as("u")), Seq("u"), "left_semi")
        .join(live.select(col("vec_id").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(true)
    }
    nodes.select(col("vec_id"))
      .join(peeled, Seq("vec_id"), "left")
      .select(col("vec_id"),
        col("peel_round").isNull.cast("int").as("in_core"),
        coalesce(col("peel_round"), lit(-1)).cast("int").as("peel_round"))
      .orderBy("vec_id")
  }

  /** DuckDB twin over the q52/q133 near-dup graph (sample vec_id % 5 = 0,
    * rounded cosine > 0.25): the same peel rounds unrolled as MATERIALIZED
    * CTEs carrying the live node set.
    */
  def oracleSql(k: Int, rounds: Int): String =
    oracleSqlFrom(
      s"""${NearDupGraph.oracleCtes()},
      live0 AS MATERIALIZED (SELECT vec_id FROM d)""",
      k, rounds, idCol = "vec_id")

  /** The peel-round twin parameterized over the WITH prefix, which must
    * end having defined `edges(u, v)` (symmetric) and `live0(vec_id)`
    * (the node set) — shared by q151 (cosine edges) and q267 (the banded
    * near-dup edge stream) so the round unrolling is generated ONCE.
    * `idCol` names the output id column.
    */
  def oracleSqlFrom(prefix: String, k: Int, rounds: Int, idCol: String): String = {
    val rs = (1 to rounds).map { r =>
      val prev = s"live${r - 1}"
      s"""deg$r AS (
        SELECT e.u AS vec_id, count(*) AS deg
        FROM edges e JOIN $prev a ON a.vec_id = e.u JOIN $prev b ON b.vec_id = e.v
        GROUP BY e.u),
      peel$r AS MATERIALIZED (
        SELECT l.vec_id, $r AS peel_round FROM $prev l
        LEFT JOIN deg$r d ON d.vec_id = l.vec_id
        WHERE coalesce(d.deg, 0) < $k),
      live$r AS MATERIALIZED (
        SELECT vec_id FROM $prev
        WHERE vec_id NOT IN (SELECT vec_id FROM peel$r))"""
    }.mkString(",\n      ")
    val peelUnion = (1 to rounds)
      .map(r => s"SELECT vec_id, peel_round FROM peel$r")
      .mkString("\n        UNION ALL ")
    s"""WITH $prefix,
      $rs,
      pl AS ($peelUnion)
      SELECT n.vec_id AS $idCol,
        CAST(CASE WHEN pl.vec_id IS NULL THEN 1 ELSE 0 END AS INTEGER) AS in_core,
        CAST(coalesce(pl.peel_round, -1) AS INTEGER) AS peel_round
      FROM live0 n LEFT JOIN pl ON pl.vec_id = n.vec_id
      ORDER BY n.vec_id"""
  }
}
