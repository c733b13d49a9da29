package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Split-conformal prediction intervals (Vovk et al., "Algorithmic
  * Learning in a Random World", 2005; Lei et al., JASA 2018 — public
  * literature): a DISTRIBUTION-FREE calibration layer over any point
  * predictor. Train a model on one split, score a held-out calibration
  * split, and take q̂ = the ⌈(1−α)(n+1)⌉-th smallest absolute residual;
  * then [ŷ − q̂, ŷ + q̂] covers the truth with probability ≥ 1−α on
  * exchangeable data — no Gaussian assumption, no variance model. Every
  * production forecaster (and the reference's SMAPE-scored sales
  * pipeline, kaggle/kaggle.py:729-791) ships point predictions; this is
  * the standard way to attach honest uncertainty to them.
  *
  * Engine shape: the model here is the per-group mean (the simplest
  * member of the predictor family — deterministic, so the whole flow is
  * oracle-checkable end-to-end; swap any regressor in at the `fit` seam
  * without touching the conformal math). Three deterministic arithmetic
  * splits (train/cal/test), one broadcast of the per-group model, one
  * per-group order statistic on the calibration residuals, one test-side
  * coverage aggregate. At 100 TB: two grouped aggregations plus a
  * windowed rank within (group × calibration) — all shuffle-by-group;
  * the rank's per-group sort is the only super-linear piece and can be
  * swapped for ExactSelect's range-narrowing when groups are huge.
  *
  * Determinism discipline: the model mean uses exactSum (order-
  * independent decimal accumulation), residuals are snapped to the 1e-4
  * grid BEFORE the order statistic (NOTES invariant 13 — rank on exact
  * grids, never raw IEEE), and coverage compares snapped residual ≤
  * snapped q̂ so a boundary ulp cannot flip a count.
  */
object Conformal {

  /** q205: 90% conformal intervals for lineitem extended price by part
    * brand. Split on (7919·l_orderkey + l_linenumber) mod 100:
    * <60 train, 60-79 calibration, ≥80 test. Output per brand: model
    * mean, calibration size, q̂ (the ⌈0.9(n+1)⌉-th smallest |residual|),
    * test size, and observed coverage — which the 1−α guarantee says
    * should land ≥ 0.9 up to finite-sample noise.
    */
  val q205 = GQuery(
    "q205_conformal_interval",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_extendedprice").as("y"),
          ((col("l_orderkey") * 7919 + col("l_linenumber")) % 100).as("slot"))
      val model = li.filter(col("slot") < 60)
        .groupBy("p_brand")
        .agg(Metrics.exactMean(col("y")).as("yhat"))
      val cal = li.filter(col("slot") >= 60 && col("slot") < 80)
        .join(broadcast(model), "p_brand")
        .select(col("p_brand"), Metrics.canonRound(abs(col("y") - col("yhat")), 4).as("r"))
      val n = cal.groupBy("p_brand").agg(count(lit(1)).as("n_cal"))
      // ⌈0.9(n+1)⌉-th smallest snapped residual: rank on the exact grid;
      // ties share a value, so any tie order yields the same q̂. The rank
      // itself is INTEGER arithmetic — ceil(9(n+1)/10) = ⌊(9(n+1)+9)/10⌋ —
      // because ceil((n+1)*0.9) in IEEE can overshoot an exact integer
      // quotient by one (0.9 is not representable).
      val ranked = cal.withColumn("rk",
        row_number().over(Window.partitionBy("p_brand").orderBy("r")))
      val qhat = ranked.join(broadcast(n), "p_brand")
        .filter(col("rk") === floor((lit(9) * (col("n_cal") + 1) + 9) / 10).cast("long"))
        .select(col("p_brand"), col("r").as("q_hat"))
      val test = li.filter(col("slot") >= 80)
        .join(broadcast(model), "p_brand")
        .join(broadcast(qhat), "p_brand")
        .groupBy("p_brand")
        .agg(
          count(lit(1)).as("n_test"),
          Metrics.canonRound(
            sum(when(Metrics.canonRound(abs(col("y") - col("yhat")), 4) <= col("q_hat"), 1L)
              .otherwise(0L)).cast("double") / count(lit(1)), 4).as("coverage"))
      // assembly of four brand-grain frames (≤ |brands| rows each):
      // broadcast explicitly — grain stays low-cardinality at any SF
      model.join(broadcast(n), "p_brand").join(broadcast(qhat), "p_brand")
        .join(broadcast(test), "p_brand")
        .select(col("p_brand"),
          Metrics.canonRound(col("yhat"), 4).as("yhat"),
          col("n_cal"), col("q_hat"), col("n_test"), col("coverage"))
        .orderBy("p_brand")
    },
    Some("""WITH li AS (
        SELECT p.p_brand, l.l_extendedprice AS y,
               (l.l_orderkey * 7919 + l.l_linenumber) % 100 AS slot
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      model AS (
        SELECT p_brand,
               CAST(sum(CAST(floor(y * 1e4 + 0.5) / 1e4 AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*) AS yhat
        FROM li WHERE slot < 60 GROUP BY p_brand),
      cal AS (
        SELECT li.p_brand, floor(abs(y - yhat) * 1e4 + 0.5) / 1e4 AS r
        FROM li JOIN model USING (p_brand)
        WHERE slot >= 60 AND slot < 80),
      n AS (SELECT p_brand, count(*) AS n_cal FROM cal GROUP BY p_brand),
      ranked AS (
        SELECT p_brand, r, row_number() OVER (PARTITION BY p_brand ORDER BY r) AS rk
        FROM cal),
      qhat AS (
        SELECT ranked.p_brand, r AS q_hat
        FROM ranked JOIN n USING (p_brand)
        WHERE rk = (9 * (n_cal + 1) + 9) // 10),
      test AS (
        SELECT li.p_brand, count(*) AS n_test,
               floor(CAST(sum(CASE WHEN floor(abs(y - yhat) * 1e4 + 0.5) / 1e4 <= q_hat
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) * 1e4 + 0.5) / 1e4 AS coverage
        FROM li JOIN model USING (p_brand) JOIN qhat USING (p_brand)
        WHERE slot >= 80 GROUP BY li.p_brand)
      SELECT p_brand,
             floor(yhat * 1e4 + 0.5) / 1e4 AS yhat,
             n_cal, q_hat, n_test, coverage
      FROM model JOIN n USING (p_brand) JOIN qhat USING (p_brand)
                 JOIN test USING (p_brand)
      ORDER BY p_brand"""))

  def all: Seq[GQuery] = Seq(q205)
}
