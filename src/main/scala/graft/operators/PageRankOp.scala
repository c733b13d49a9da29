package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PageRank over an edge list (directed; callers
  * symmetrize first for undirected graphs), fixed round count, no
  * dangling-mass term (callers restrict to nodes with ≥1 out-edge).
  *
  * HYBRID execution, same dispatch as ConnectedComponents.components: a
  * near-dup graph is the similarity RELATION, not the corpus — usually
  * tiny. At or below `smallGraphThreshold` edges the list is collected
  * and iterated on the driver (array passes; the ~2 shuffles × rounds of
  * the distributed loop are pure scheduling overhead there — measured
  * ~6s → ~0.5s for q122 at sf0.1). Above it, the distributed loop: per
  * round one equi join of ranks onto the cached (edge, degree) frame and
  * one hash agg of contributions by target — the classic Pregel-as-SQL
  * round, identical numerics. Both paths land within the 1e-6 canonical
  * rounding of each other and of the DuckDB unrolled-CTE oracle
  * (double-sum association differences are ~1e-16 relative; spec-held).
  */
object PageRankOp {

  /** The DuckDB twin of [[ranks]]'s round structure: `deg`/`n`/`pr0` plus
    * `rounds` unrolled power-iteration CTEs over a PRECEDING `edges`(u, v)
    * CTE; the final CTE is `pr<rounds>`($idCol, pr). This is the single
    * generator both q122 and q261 splice into their oracles — the same
    * discipline as DedupQueries.edgePipelineOracleCtes, so a numerics or
    * tie-break change can never desynchronize one hand-kept copy from the
    * other (review finding, r14). d=0.85 is fixed: it is the only damping
    * any registry oracle uses. The base term is emitted as (1.0 - 0.85),
    * NOT the literal 0.15: [[ranks]] computes (1.0 - damping) in IEEE,
    * which is 0.15000000000000002 — one ulp ABOVE what the literal 0.15
    * parses to — and emitting the same subtraction keeps both engines on
    * the identical double (review finding, r14). Residual cross-engine
    * risk, accepted and documented: the per-node Σ pr/deg contribution
    * sums are raw double additions whose order differs per engine; at
    * the 1e-6 canonical rounding a value would have to land within
    * ~1e-15 of a grid boundary after 10 rounds to diverge — none of the
    * fixture graphs does, and the alternative (integer-grid-snapping
    * every round) would change every PageRank value for a hazard the
    * gate would surface loudly if it ever fired. Round CTEs are
    * MATERIALIZED — DuckDB re-evaluates multiply-referenced plain CTEs
    * (NOTES invariant 12).
    *
    * SYMMETRIC edge sets only (review finding, r15): on a directed
    * graph this twin and `ranks` keep DIFFERENT node sets — `ranks`
    * carries every out-degree node through each round (coalesce(c, 0)),
    * while the pr_i CTE keeps only nodes reachable as e.v from the
    * previous round, so a source-only node's contributions vanish from
    * round 2 and sink-only nodes appear on one side only. Both current
    * consumers (q122, q261) symmetrize; a future directed-graph query
    * must NOT splice this generator without reworking both sides.
    */
  def oracleRoundCtes(rounds: Int, idCol: String): String = {
    val iters = (1 to rounds).map { i =>
      s"""pr$i AS MATERIALIZED (
        SELECT e.v AS $idCol, (1.0 - 0.85)/(SELECT nn FROM n) + 0.85*sum(p.pr/dg.deg) AS pr
        FROM edges e JOIN pr${i - 1} p ON p.$idCol = e.u JOIN deg dg ON dg.u = e.u
        GROUP BY e.v)"""
    }.mkString(",\n      ")
    s"""deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM edges GROUP BY u),
      n AS (SELECT count(*) AS nn FROM deg),
      pr0 AS (SELECT u AS $idCol, 1.0/(SELECT nn FROM n) AS pr FROM deg),
      $iters"""
  }

  /** Returns (vec_id, pr) — RAW ranks; callers round for output. */
  def ranks(edges: DataFrame, rounds: Int, damping: Double = 0.85,
            smallGraphThreshold: Long = 1L << 20): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val cols = edges.columns
    require(cols.length == 2, s"expected 2 edge columns, got ${cols.mkString(",")}")
    val e = edges.select(col(cols(0)).cast("long").as("u"), col(cols(1)).cast("long").as("v"))
    val deg = e.groupBy("u").agg(count(lit(1)).as("deg")).cache()
    val n = deg.count()
    if (n == 0L) {
      deg.unpersist()
      return Seq.empty[(Long, Double)].toDF("vec_id", "pr")
    }
    val base = (1.0 - damping) / n
    if (e.count() <= smallGraphThreshold) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(identity)
      val degm = es.groupBy(_._1).map { case (u, xs) => u -> xs.length }
      var pr = degm.keysIterator.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to rounds) {
        val contrib = scala.collection.mutable.HashMap.empty[Long, Double]
        es.foreach { case (u, v) =>
          contrib.update(v, contrib.getOrElse(v, 0.0) + pr(u) / degm(u))
        }
        pr = degm.keysIterator.map(k => k -> (base + damping * contrib.getOrElse(k, 0.0))).toMap
      }
      deg.unpersist()
      pr.toSeq.toDF("vec_id", "pr")
    } else {
      val edgesD = e.join(deg, "u").cache() // (u, v, deg)
      var rank = deg.select(col("u").as("vec_id"), lit(1.0 / n).as("pr"))
      for (_ <- 1 to rounds) {
        val contrib = edgesD.join(rank, col("u") === col("vec_id"))
          .groupBy(col("v")).agg(sum(col("pr") / col("deg")).as("c"))
        rank = deg.select(col("u").as("vec_id"))
          .join(contrib, col("vec_id") === col("v"), "left")
          .select(col("vec_id"),
            (lit(base) + lit(damping) * coalesce(col("c"), lit(0.0))).as("pr"))
      }
      // Materialize the result before releasing the loop caches so the
      // returned frame never re-derives the round chain, then drop them —
      // otherwise repeated large-graph calls accumulate cached blocks.
      rank = rank.cache()
      rank.count()
      edgesD.unpersist()
      deg.unpersist()
      rank
    }
  }
}
