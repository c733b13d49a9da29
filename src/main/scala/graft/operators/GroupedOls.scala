package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Per-group simple linear regression (slope / intercept / R²) from
  * sufficient statistics — the OLAP regression primitive: one grouped
  * aggregation collects (n, Σx, Σy, Σxy, Σx², Σy²) and the closed-form
  * estimates fall out per group. No MLlib, no iteration, no second
  * pass: at 100 TB this is a single map-side-combinable shuffle-by-key
  * aggregation (the same cost as a grouped mean), which is why every
  * warehouse ships it as regr_slope/regr_r2 — re-expressed here so the
  * arithmetic is ENGINE-EXACT instead of float-accumulation-ordered.
  *
  * Exactness discipline: x and y are snapped to centi-units as BIGINTs
  * (both fixture columns are ≤ 2-decimal), so every sufficient
  * statistic is an exact integer accumulated in DECIMAL(38,0) (the
  * q185 Σc² precedent — associative, partition-order-free). The
  * closed-form divisions then run on DOUBLEs converted once from those
  * exact integers: identical inputs, one IEEE expression, identical
  * results in any engine. Slope and R² are invariant to the common
  * ×100 scaling; the intercept divides it back out.
  *
  * Reference behavior anchor: the reference fits sklearn regressions
  * per series (kaggle/kaggle.py:729-778); this is the closed-form
  * single-feature member of that family as a pure query — the trend
  * readout that needs no training loop.
  */
object GroupedOls {

  /** (group, n, slope, intercept, r2) of y ~ x per group; inputs are
    * snapped to the 1e-2 grid. Groups with zero x-variance emit null
    * slope/intercept/r2 (vertical fit) rather than dividing by zero.
    */
  def fit(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val xi = floor(col(xCol) * 100 + 0.5).cast("long")
    val yi = floor(col(yCol) * 100 + 0.5).cast("long")
    val s = df
      .select(col(groupCol).as("g"), xi.as("xi"), yi.as("yi"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xi").cast("decimal(38,0)")).as("sx"),
        sum(col("yi").cast("decimal(38,0)")).as("sy"),
        sum((col("xi") * col("yi")).cast("decimal(38,0)")).as("sxy"),
        sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("sxx"),
        sum((col("yi") * col("yi")).cast("decimal(38,0)")).as("syy"))
    val n = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val varx = n * col("sxx").cast("double") - sx * sx
    val vary = n * col("syy").cast("double") - sy * sy
    val cov = n * col("sxy").cast("double") - sx * sy
    val slope = cov / varx
    s.select(
      col("g"), col("n"),
      Metrics.canonRound(when(varx > 0, slope), 6).as("slope"),
      Metrics.canonRound(when(varx > 0, (sy - slope * sx) / n / 100.0), 6)
        .as("intercept"),
      Metrics.canonRound(when(varx > 0 && vary > 0, cov * cov / (varx * vary)), 6)
        .as("r2"))
  }

  /** q208: extended price regressed on quantity per part brand — the
    * per-brand price-per-unit trend with its fit quality. The oracle
    * recomputes the same integer sufficient statistics and the same
    * one-shot double arithmetic. (The synthetic fixture draws price
    * independently of quantity, so R² correctly reads ≈ 0 — the
    * fit-quality column reporting "no relationship" is the operator
    * working, and the oracle pins the exact tiny value either way.)
    */
  val q208 = GQuery(
    "q208_grouped_ols",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      fit(li, "p_brand", "l_quantity", "l_extendedprice")
        .withColumnRenamed("g", "p_brand")
        .orderBy("p_brand")
    },
    Some("""WITH s AS (
        SELECT p.p_brand,
               count(*) AS n,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS sx,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)
                 * CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)
                 * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS sxx,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                 * CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS syy
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand),
      d AS (
        SELECT p_brand, n,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
               CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vary,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s)
      SELECT p_brand, n,
             CASE WHEN varx > 0
                  THEN floor(cov / varx * 1e6 + 0.5) / 1e6 END AS slope,
             CASE WHEN varx > 0
                  THEN floor((syd - cov / varx * sxd) / n / 100.0 * 1e6 + 0.5) / 1e6 END AS intercept,
             CASE WHEN varx > 0 AND vary > 0
                  THEN floor(cov * cov / (varx * vary) * 1e6 + 0.5) / 1e6 END AS r2
      FROM d ORDER BY p_brand"""))

  /** q217: per-group quantile regression lines — the pinball-loss member
    * of the per-group regression family (pairs with q208's OLS and
    * q205's conformal intervals). Exact, deterministic construction:
    * the group's OLS slope anchors the line (q208's integer sufficient
    * statistics), and the τ-quantile intercepts are EXACT order
    * statistics of the 1e-4-snapped residuals — the k = ⌈τ·n⌉ smallest
    * residual, computed from integer ranks, never an interpolating
    * quantile (Spark percentile_approx and DuckDB quantile_cont would
    * each interpolate differently; the integer-rank definition is the
    * one both engines reproduce bit-for-bit). For τ=0.9 the query also
    * reports the pinball loss of the shifted line — carried as EXACT
    * integer 1e-4 units (ρ_0.9 in tenths: 9·max(u,0) + max(−u,0),
    * divided out once at the end) — and the empirical coverage.
    *
    * Scale shape: suff-stats agg (map-side combinable) → residual scan
    * with broadcast coefficients → per-(group, value) count agg → one
    * cumulative window over DISTINCT residual values per group (the
    * histogram-CDF idiom; at 100 TB narrow first with q202's ExactSelect
    * bucketing so the window runs over buckets, not values) → broadcast
    * quantiles back for the pinball/coverage pass.
    */
  val q217 = GQuery(
    "q217_quantile_regression",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val li = Tables.lineitem(s, dir)
        .join(broadcast(Tables.part(s, dir).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
      val coefs = fit(li, "p_brand", "l_quantity", "l_extendedprice")
        .filter(col("slope").isNotNull)
        .select(col("g").as("p_brand"), col("slope"), col("intercept"))
      // deliberately NOT cached despite three consumers: the subtree is
      // one cheap whole-stage-codegen scan + broadcast join (re-running
      // it 3x measured FASTER than materializing 600k rows to the memory
      // store — 4.1-4.6s vs 5.3-6.0s at sf0.1; the capBuckets rule
      // applies when the recomputed subtree carries expensive hashing,
      // which this one doesn't)
      val res = li.select(col("p_brand"), col("l_quantity").as("x"),
          col("l_extendedprice").as("y"))
        .join(broadcast(coefs), "p_brand")
        .select(col("p_brand"), col("slope"), col("intercept"),
          floor((col("y") - (col("intercept") + col("slope") * col("x"))) * 1e4 + 0.5)
            .cast("long").as("ri"))
      val perVal = res.groupBy("p_brand", "slope", "intercept", "ri")
        .agg(count(lit(1)).as("c"))
      val wCum = w.partitionBy("p_brand").orderBy("ri")
        .rowsBetween(w.unboundedPreceding, 0)
      val cum = perVal.withColumn("cum", sum("c").over(wCum))
      val tot = res.groupBy("p_brand").agg(count(lit(1)).as("n"))
      def kOf(p: Int) =
        floor((col("n") * p + 9).cast("double") / 10.0).cast("long")
      val quants = cum.join(broadcast(tot), "p_brand")
        .groupBy("p_brand", "slope", "intercept", "n")
        .agg(min(when(col("cum") >= kOf(1), col("ri"))).as("q10i"),
          min(when(col("cum") >= kOf(5), col("ri"))).as("q50i"),
          min(when(col("cum") >= kOf(9), col("ri"))).as("q90i"))
      val pin = res.select(col("p_brand"), col("ri"))
        .join(broadcast(quants.select(col("p_brand"), col("q90i"))), "p_brand")
        .withColumn("u", col("ri") - col("q90i"))
        .groupBy("p_brand")
        .agg(sum(when(col("u") > 0, col("u") * 9).otherwise(-col("u"))
              .cast("decimal(38,0)")).as("ps"),
          sum((col("ri") <= col("q90i")).cast("long")).as("n_cov"))
      quants.join(broadcast(pin), "p_brand")
        .select(col("p_brand"), col("n"), col("slope"), col("intercept"),
          Metrics.canonRound(col("q10i").cast("double") / 1e4, 4).as("q10"),
          Metrics.canonRound(col("q50i").cast("double") / 1e4, 4).as("q50"),
          Metrics.canonRound(col("q90i").cast("double") / 1e4, 4).as("q90"),
          Metrics.canonRound(
            col("ps").cast("double") / 10.0 / col("n").cast("double") / 1e4, 4)
            .as("pinball90"),
          Metrics.canonRound(col("n_cov").cast("double") / col("n").cast("double"), 4)
            .as("cov90"))
        .orderBy("p_brand")
    },
    Some("""WITH s AS (
        SELECT p.p_brand,
               count(*) AS n,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS sx,
               sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS sy,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)
                 * CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS sxy,
               sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)
                 * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS sxx
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand),
      d AS (
        SELECT p_brand, n,
               CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS varx,
               CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM s),
      coefs AS (
        SELECT p_brand,
               floor(cov / varx * 1e6 + 0.5) / 1e6 AS slope,
               floor((syd - cov / varx * sxd) / n / 100.0 * 1e6 + 0.5) / 1e6 AS intercept
        FROM d WHERE varx > 0),
      res AS (
        SELECT l2.p_brand, c.slope, c.intercept,
          CAST(floor((l2.y - (c.intercept + c.slope * l2.x)) * 1e4 + 0.5) AS BIGINT) AS ri
        FROM (
          SELECT p.p_brand, l.l_quantity AS x, l.l_extendedprice AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey) l2
        JOIN coefs c ON c.p_brand = l2.p_brand),
      pv AS (
        SELECT p_brand, slope, intercept, ri, count(*) AS c
        FROM res GROUP BY 1, 2, 3, 4),
      cum AS (
        SELECT p_brand, slope, intercept, ri, c,
          sum(c) OVER (PARTITION BY p_brand ORDER BY ri) AS cum
        FROM pv),
      tot AS (SELECT p_brand, count(*) AS n FROM res GROUP BY 1),
      quants AS (
        SELECT c.p_brand, c.slope, c.intercept, t.n,
          min(CASE WHEN c.cum >= (t.n * 1 + 9) // 10 THEN c.ri END) AS q10i,
          min(CASE WHEN c.cum >= (t.n * 5 + 9) // 10 THEN c.ri END) AS q50i,
          min(CASE WHEN c.cum >= (t.n * 9 + 9) // 10 THEN c.ri END) AS q90i
        FROM cum c JOIN tot t USING (p_brand)
        GROUP BY 1, 2, 3, 4),
      pin AS (
        SELECT r.p_brand,
          sum(CASE WHEN r.ri - q.q90i > 0 THEN (r.ri - q.q90i) * 9
                   ELSE -(r.ri - q.q90i) END) AS ps,
          sum(CASE WHEN r.ri <= q.q90i THEN 1 ELSE 0 END) AS n_cov
        FROM res r JOIN quants q USING (p_brand)
        GROUP BY 1)
      SELECT q.p_brand, q.n, q.slope, q.intercept,
        floor(CAST(q.q10i AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 AS q10,
        floor(CAST(q.q50i AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 AS q50,
        floor(CAST(q.q90i AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 AS q90,
        floor(CAST(p.ps AS DOUBLE) / 10.0 / CAST(q.n AS DOUBLE) / 1e4 * 1e4 + 0.5) / 1e4 AS pinball90,
        floor(CAST(p.n_cov AS DOUBLE) / CAST(q.n AS DOUBLE) * 1e4 + 0.5) / 1e4 AS cov90
      FROM quants q JOIN pin p USING (p_brand)
      ORDER BY q.p_brand"""))

  def all: Seq[GQuery] = Seq(q208, q217)
}
