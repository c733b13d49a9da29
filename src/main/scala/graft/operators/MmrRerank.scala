package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Metrics, VectorOps}

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity pass a retrieval pipeline runs on its ANN
  * shortlist so the k results it keeps aren't k near-copies: greedily
  * select argmax λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s).
  *
  * Everything is pinned for cross-engine replay: rel and pair sims are
  * 1e-6-snapped cosines, the score recomputes from those identical
  * inputs in one IEEE expression and snaps again before the argmax, and
  * ties break by vec_id — so the DuckDB oracle unrolls the greedy
  * rounds exactly (the q122/q126/q127 playbook).
  *
  * Scale shape: the shortlist is per-probe bounded (shortK rows), so
  * the pair frame is probes × shortK² via equi joins — never corpus².
  * Each greedy round is an anti-join + one (probe, candidate) max-agg
  * over that bounded frame; rounds are selectK−1 ≪ shortK. Per-round
  * lineage is truncated with localCheckpoint (NOTES invariant — chained
  * cached joins across rounds trip AQE exchange reuse).
  */
object MmrRerank {

  /** @param e embeddings (vec_id, embedding), probes = vec_id < 5
    * @return (q_id, sel_rank, vec_id, score) — selectK rows per probe
    */
  def rerank(e: DataFrame, shortK: Int, selectK: Int, lambda: Double): DataFrame = {
    require(selectK >= 1 && selectK <= shortK, s"need 1 <= selectK=$selectK <= shortK=$shortK")
    val short = SimilarityQueries.bruteForceTopK(e, shortK)
      .select(col("q_id"), col("vec_id"), col("cos_sim").as("rel"))
      .localCheckpoint(true)
    val emb = e.select(col("vec_id"), col("embedding"))
    val pairs = short.select(col("q_id"), col("vec_id").as("a"))
      .join(emb.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(short.select(col("q_id"), col("vec_id").as("b"))
        .join(emb.select(col("vec_id").as("b"), col("embedding").as("eb")), "b"), "q_id")
      .filter(col("a") =!= col("b"))
      .select(col("q_id"), col("a"), col("b"),
        Metrics.canonRound(VectorOps.cosine(col("ea"), col("eb")), 6).as("sim"))
      .localCheckpoint(true)
    val wSel = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id").asc)
    // round 1 is pure relevance (nothing selected yet): score = λ·rel
    var selected = short
      .withColumn("score", Metrics.canonRound(lit(lambda) * col("rel"), 6))
      .withColumn("rk", row_number().over(wSel)).filter(col("rk") === 1)
      .select(col("q_id"), col("vec_id"), lit(1).cast("int").as("sel_rank"), col("score"))
    for (r <- 2 to selectK) {
      val cand = short.join(selected.select("q_id", "vec_id"), Seq("q_id", "vec_id"), "left_anti")
      val ms = pairs
        .join(selected.select(col("q_id"), col("vec_id").as("b")), Seq("q_id", "b"))
        .groupBy(col("q_id"), col("a").as("vec_id")).agg(max("sim").as("maxsim"))
      val pick = cand.join(ms, Seq("q_id", "vec_id"))
        .withColumn("score",
          Metrics.canonRound(lit(lambda) * col("rel") - lit(1 - lambda) * col("maxsim"), 6))
        .withColumn("rk", row_number().over(wSel)).filter(col("rk") === 1)
        .select(col("q_id"), col("vec_id"), lit(r).cast("int").as("sel_rank"), col("score"))
      selected = selected.unionByName(pick).localCheckpoint(true)
    }
    selected.select(col("q_id"), col("sel_rank"), col("vec_id"), col("score"))
      .orderBy("q_id", "sel_rank")
  }

  /** DuckDB twin: shortlist + pair sims once, then selectK−1 unrolled
    * greedy rounds (MATERIALIZED per the exponential-inlining rule).
    */
  def oracleSql(shortK: Int, selectK: Int, lambda: Double): String = {
    val lam = lambda.toString
    val oneMinus = (1 - lambda).toString
    val rounds = (2 to selectK).map { r =>
      val prev = s"sel${r - 1}"
      s"""cand$r AS (
        SELECT sh.q_id, sh.vec_id, sh.rel FROM short sh
        LEFT JOIN $prev s ON s.q_id = sh.q_id AND s.vec_id = sh.vec_id
        WHERE s.vec_id IS NULL),
      ms$r AS (
        SELECT p.q_id, p.a AS vec_id, max(p.sim) AS maxsim
        FROM pr p JOIN $prev s ON s.q_id = p.q_id AND s.vec_id = p.b
        GROUP BY p.q_id, p.a),
      pick$r AS MATERIALIZED (
        SELECT q_id, vec_id, $r AS sel_rank, score FROM (
          SELECT c.q_id, c.vec_id,
            floor(($lam*c.rel - $oneMinus*m.maxsim)*1e6 + 0.5)/1e6 AS score,
            row_number() OVER (PARTITION BY c.q_id
              ORDER BY floor(($lam*c.rel - $oneMinus*m.maxsim)*1e6 + 0.5)/1e6 DESC,
                       c.vec_id ASC) AS rk
          FROM cand$r c JOIN ms$r m ON m.q_id = c.q_id AND m.vec_id = c.vec_id)
        WHERE rk = 1),
      sel$r AS MATERIALIZED (
        SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM pick$r)"""
    }.mkString(",\n      ")
    s"""WITH e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      probes AS (SELECT vec_id AS q_id, emb AS q FROM e WHERE vec_id < 5),
      sims AS (
        SELECT p.q_id, e.vec_id,
          floor(list_cosine_similarity(p.q, e.emb)*1e6 + 0.5)/1e6 AS rel
        FROM e CROSS JOIN probes p WHERE e.vec_id <> p.q_id),
      short AS MATERIALIZED (
        SELECT q_id, vec_id, rel FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, vec_id) AS rk
          FROM sims)
        WHERE rk <= $shortK),
      pr AS MATERIALIZED (
        SELECT s1.q_id, s1.vec_id AS a, s2.vec_id AS b,
          floor(list_cosine_similarity(ea.emb, eb.emb)*1e6 + 0.5)/1e6 AS sim
        FROM short s1
        JOIN short s2 ON s2.q_id = s1.q_id AND s2.vec_id <> s1.vec_id
        JOIN e ea ON ea.vec_id = s1.vec_id
        JOIN e eb ON eb.vec_id = s2.vec_id),
      sel1 AS MATERIALIZED (
        SELECT q_id, vec_id, 1 AS sel_rank, floor($lam*rel*1e6 + 0.5)/1e6 AS score FROM (
          SELECT *, row_number() OVER (PARTITION BY q_id
            ORDER BY floor($lam*rel*1e6 + 0.5)/1e6 DESC, vec_id ASC) AS rk
          FROM short)
        WHERE rk = 1),
      $rounds
      SELECT q_id, CAST(sel_rank AS INTEGER) AS sel_rank, vec_id, score
      FROM sel$selectK ORDER BY q_id, sel_rank"""
  }
}
