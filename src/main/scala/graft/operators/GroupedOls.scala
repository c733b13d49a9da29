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

  def all: Seq[GQuery] = Seq(q208)
}
