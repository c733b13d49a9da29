package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Metrics

/** Mergeable quantile sketch via an equi-width histogram CDF — the
  * quantile member of the sketch family (HLL cardinality q27/q98, Bloom
  * membership q86, CMS frequency q124): per group, `nBins` equal-width
  * bin counts over the GLOBAL value range, quantiles estimated by linear
  * interpolation inside the covering bin. Spark's own percentile_approx
  * (KLL-ish) serves the same role but its internals aren't
  * cross-engine-reproducible; the fixed-bin histogram is DETERMINISTIC —
  * bin edges are arithmetic on a broadcast 1-row global min/max — so the
  * whole sketch, including the interpolation, replays in DuckDB.
  *
  * Why it matters at 100 TB: bin counts are RE-AGGREGABLE (plain sums —
  * the q98 rollup property), so per-partition/per-day sketches merge by
  * addition into any coarser grain without touching raw data, and the
  * shuffle carries nBins longs per group instead of the column. Error is
  * bounded by bin width; the est_error column reports it against the
  * exact per-group percentile on the fixture.
  *
  * Scale shape: one broadcast 1-row (min, max) agg, one map-side-
  * combinable (group, bin) count agg, and the quantile extraction runs
  * on the nBins-row-per-group aggregate — never the data.
  */
object HistogramQuantile {

  /** Per-group quantile estimates for `ps` (e.g. 0.5/0.9/0.99) of
    * `valueCol` over `groupCol`, `nBins` equal-width bins.
    * Returns (group, p, est, exact, est_error) — exact and error kept as
    * fixture-scale evidence of the bin-width bound.
    */
  /** The sketch itself: per-(group, bin) counts against FIXED bounds.
    * This is the mergeable object — sketches of disjoint slices built
    * against the same bounds add cell-wise into the sketch of their
    * union (spec-proved), which is what lets per-partition/per-day
    * sketches roll up to any grain without re-reading data.
    */
  def binCounts(df: DataFrame, groupCol: String, valueCol: String,
                nBins: Int, bounds: DataFrame): DataFrame = {
    val v = col(valueCol).cast("double")
    // bin index in [0, nBins-1]; the max value folds into the last bin
    df.crossJoin(broadcast(bounds))
      .select(col(groupCol).as("g"), v.as("x"), col("lo"), col("hi"))
      // hi == lo (constant column): everything lands in bin 0 and the
      // zero bin width makes every estimate exactly lo — not NULL bins
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0))
          .otherwise(least(
            floor((col("x") - col("lo")) / (col("hi") - col("lo")) * nBins).cast("int"),
            lit(nBins - 1))))
      .groupBy("g", "bin").agg(count(lit(1)).as("c"))
  }

  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
                nBins: Int, ps: Seq[Double]): DataFrame = {
    val v = col(valueCol).cast("double")
    // 1-row frame, but its subtree is a full corpus min/max scan and it
    // is consumed by binCounts AND every per-p branch — cache it too
    val bounds = df.agg(min(v).as("lo"), max(v).as("hi")).cache()
    bounds.count()
    // cache + eager: the per-p branches below each reference the cdf —
    // uncached, EVERY requested percentile re-runs the corpus histogram
    // aggregation (plus the bounds scan embedded via the crossJoin) for
    // a frame of only |groups|×nBins rows (review finding, r15; the
    // exact side below was already collapsed to one pass, the sketch
    // side paid p passes). The ≤ sketch-sized cache needs no unpersist.
    val counts = binCounts(df, groupCol, valueCol, nBins, bounds).cache()
    counts.count()
    val wcum = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cdf = counts
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("n", sum("c").over(Window.partitionBy("g")))
    val perP = ps.map { p =>
      // covering bin: first bin with cum >= ceil(p · n); interpolate
      // within it. The rank target stays integral (ceil of p·n as a
      // long) so the covering-bin choice cannot drift between engines.
      val target = ceil(lit(p) * col("n")).cast("long")
      cdf.filter(col("cum") >= target)
        .withColumn("rk", row_number().over(Window.partitionBy("g").orderBy("bin")))
        .filter(col("rk") === 1)
        .crossJoin(broadcast(bounds))
        .withColumn("w", (col("hi") - col("lo")) / nBins)
        .select(col("g"), lit(p).as("p"),
          Metrics.canonRound(
            col("lo") + col("w") * (col("bin") +
              (target - (col("cum") - col("c"))).cast("double") / col("c")), 4).as("est"))
    }.reduce(_ unionByName _)
    // all exact percentiles in ONE aggregation pass (array form), then
    // unpacked — p separate passes each re-sorted the fact table
    val psArr = ps.mkString(", ")
    val exactPerP = df.groupBy(col(groupCol).as("g"))
      .agg(expr(s"percentile($valueCol, array($psArr))").as("exs"))
      .select(col("g"), posexplode(col("exs")).as(Seq("i", "ex")))
      .select(col("g"),
        element_at(array(ps.map(lit): _*), col("i") + 1).as("p"),
        Metrics.canonRound(col("ex"), 4).as("exact"))
    perP.join(exactPerP, Seq("g", "p"))
      .select(col("g").as(groupCol), col("p"), col("est"), col("exact"),
        Metrics.canonRound(abs(col("est") - col("exact")), 4).as("est_error"))
      .orderBy(groupCol, "p")
  }

  /** DuckDB twin: identical bin edges, CDF, covering-bin interpolation,
    * and exact-percentile comparison.
    */
  def oracleSql(table: String, groupCol: String, valueCol: String,
                nBins: Int, ps: Seq[Double]): String = {
    val psList = ps.mkString(", ")
    s"""WITH bounds AS (SELECT min(CAST($valueCol AS DOUBLE)) AS lo, max(CAST($valueCol AS DOUBLE)) AS hi FROM $table),
      binned AS (SELECT $groupCol AS g,
          CASE WHEN hi = lo THEN 0
               ELSE least(CAST(floor((CAST($valueCol AS DOUBLE) - lo) / (hi - lo) * $nBins) AS INTEGER), ${nBins - 1})
          END AS bin
        FROM $table, bounds),
      counts AS (SELECT g, bin, count(*) AS c FROM binned GROUP BY g, bin),
      cdf AS (SELECT g, bin, c,
          sum(c) OVER (PARTITION BY g ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          sum(c) OVER (PARTITION BY g) AS n
        FROM counts),
      pgrid AS (SELECT unnest([$psList]) AS p),
      hits AS (SELECT g, p, bin, c, cum, n,
          row_number() OVER (PARTITION BY g, p ORDER BY bin) AS rk
        FROM cdf, pgrid
        WHERE cum >= CAST(ceil(p * n) AS BIGINT)),
      est AS (SELECT g, p,
          floor((lo + (hi - lo)/$nBins * (bin + CAST(CAST(ceil(p * n) AS BIGINT) - (cum - c) AS DOUBLE)/c)) * 1e4 + 0.5)/1e4 AS est
        FROM hits, bounds WHERE rk = 1),
      ex AS (${ps.map(p =>
        s"""SELECT $groupCol AS g, CAST($p AS DOUBLE) AS p,
          floor(quantile_cont(CAST($valueCol AS DOUBLE), $p) * 1e4 + 0.5)/1e4 AS exact
        FROM $table GROUP BY $groupCol""").mkString("\n        UNION ALL ")})
      SELECT e.g AS $groupCol, e.p, e.est, x.exact,
        floor(abs(e.est - x.exact) * 1e4 + 0.5)/1e4 AS est_error
      FROM est e JOIN ex x ON x.g = e.g AND x.p = e.p
      ORDER BY $groupCol, e.p"""
  }
}
