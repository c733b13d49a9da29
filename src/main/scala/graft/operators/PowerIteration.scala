package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Top principal direction of the embedding cloud by POWER ITERATION on
  * the (uncentered) second-moment matrix XᵀX — the spectral primitive
  * behind embedding whitening, ABTT post-processing (Mu & Viswanath,
  * ICLR 2018: dominant directions of sentence-embedding spaces carry
  * corpus-wide bias and are routinely projected out), PCA-based drift
  * monitoring, and spectral initialization for the IVF/PQ quantizers
  * (q53/q107). Complements q148's mean-shift drift check with the
  * direction-of-variance view.
  *
  * Why power iteration and not a Gram matrix: XᵀX is d×d (64×64 here —
  * trivial), but at 100 TB building it is one d²-wide aggregation whose
  * partial states are d² doubles per task; power iteration instead
  * needs only two NARROW aggregations per round — s_i = x_i·v (shuffle
  * key i) and u = Σ s_i·x_i (shuffle key j ≤ d) — with the model state
  * a single d-vector on the driver (the Lloyd-centroid precedent:
  * bounded state, never corpus-sized). Rounds are O(log(1/ε)/log(λ₁/λ₂));
  * the round count is a parameter and the oracle unrolls exactly that
  * many, so the check is exact at ANY round count (the fixture's gap
  * gives cos(round4, round5) ≈ 0.993 — stable, still refining).
  *
  * Exactness discipline (the q127 Lloyd playbook, hardened to INTEGER
  * arithmetic end-to-end): embeddings are snapped once to the 1e-6 grid
  * as BIGINTs; each round's matvec is then exact integer arithmetic —
  * s_i fits a long (≤ d·4e12), the second moment u_j accumulates in
  * DECIMAL(38,0) (products reach ~1e21; the q185 Σc² precedent) — and
  * the only IEEE steps are one max-normalization division per round and
  * the final L2 normalization, identical single operations both engines
  * round identically. No float sum ever crosses a partition boundary.
  */
object PowerIteration {

  /** (dim 0-based, loading) of the top right singular vector of the
    * snapped embedding matrix after `rounds` power-iteration rounds,
    * L2-normalized, sign as the iteration converges from the all-ones
    * start.
    */
  def topDirection(e: DataFrame, rounds: Int): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val xq = e.select(col("vec_id").as("i"),
        posexplode(col("embedding")).as(Seq("j", "x")))
      .select(col("i"), col("j"),
        floor(col("x").cast("double") * 1e6 + 0.5).cast("long").as("xq"))
      .cache()
    val dim = xq.agg(max("j")).head().getInt(0) + 1
    // driver-held model state: d integers (bounded, like Lloyd centroids)
    var v: Array[Long] = Array.fill(dim)(1000000L)
    for (_ <- 1 to rounds) {
      val vDf = v.zipWithIndex.map { case (w, j) => (j, w) }.toSeq.toDF("j", "vq")
      val s = xq.join(broadcast(vDf), "j")
        .groupBy("i").agg(sum(col("xq") * col("vq")).as("s"))
      val u = xq.join(s, "i")
        .groupBy("j")
        .agg(sum(col("s").cast("decimal(38,0)") * col("xq")).as("u"))
        .orderBy("j")
        .collect()
      val uArr = Array.fill(dim)(BigDecimal(0))
      u.foreach(r => uArr(r.getInt(0)) = BigDecimal(r.getDecimal(1)))
      // one IEEE step: max-normalize back onto the 1e-6 integer grid
      val m = uArr.map(_.abs).max.toDouble
      v = uArr.map(b => math.floor(b.toDouble / m * 1e6 + 0.5).toLong)
    }
    xq.unpersist()
    val n = math.sqrt(v.map(w => w.toDouble * w.toDouble).sum)
    v.zipWithIndex.map { case (w, j) =>
      (j, math.floor(w / n * 1e6 + 0.5) / 1e6)
    }.toSeq.toDF("dim", "loading").orderBy("dim")
  }

  /** q206: the top principal direction of the embeddings table, 4
    * rounds. The DuckDB twin unrolls the same integer rounds; a matvec
    * that dropped a row, a sum that ran in floats, or a normalization
    * rounded differently would all hash-mismatch.
    */
  val q206 = GQuery(
    "q206_power_iteration",
    (s, dir) => topDirection(Tables.embeddings(s, dir), rounds = 4),
    Some {
      val roundCtes = (1 to 4).map { r =>
        val prev = if (r == 1) "v0" else s"v${r - 1}"
        s"""s$r AS MATERIALIZED (
        SELECT i, sum(xq * vq) AS s FROM xq JOIN $prev USING (j) GROUP BY i),
      u$r AS MATERIALIZED (
        SELECT j, sum(CAST(s AS DECIMAL(38,0)) * xq) AS u
        FROM xq JOIN s$r USING (i) GROUP BY j),
      m$r AS (SELECT CAST(max(abs(u)) AS DOUBLE) AS m FROM u$r),
      v$r AS MATERIALIZED (
        SELECT j, CAST(floor(CAST(u AS DOUBLE) / m * 1e6 + 0.5) AS BIGINT) AS vq
        FROM u$r CROSS JOIN m$r)"""
      }.mkString(",\n      ")
      s"""WITH xq AS MATERIALIZED (
        SELECT vec_id AS i, g.i - 1 AS j,
               CAST(floor(CAST(embedding[g.i] AS DOUBLE) * 1e6 + 0.5) AS BIGINT) AS xq
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) g),
      v0 AS (SELECT g.i - 1 AS j, CAST(1000000 AS BIGINT) AS vq
             FROM (SELECT unnest(range(1, 65)) AS i) g),
      $roundCtes,
      nrm AS (SELECT sqrt(CAST(sum(vq * vq) AS DOUBLE)) AS n FROM v4)
      SELECT CAST(j AS INTEGER) AS dim,
             floor(vq / n * 1e6 + 0.5) / 1e6 AS loading
      FROM v4 CROSS JOIN nrm ORDER BY dim"""
    })

  def all: Seq[GQuery] = Seq(q206)
}
