package graft

import org.apache.spark.sql.functions._

/** Comparison against the reference's only published timing ("3s CPU
  * times" for a single model fit on the 26,297-row dataset, BASELINE.md):
  * generate the same-sized 4-year sales frame, build features + encoders,
  * fit BoostedHybrid, predict — print wall times. Then demonstrate the
  * reference's full PRODUCTION ensemble shape (12 BoostedHybrid combos ×
  * 15 rolling-origin folds + ridge meta, kaggle/kaggle.py:729-778,791)
  * end-to-end with a bounded per-base budget.
  *
  * Partitioning: the frame is coalesced to 4 partitions — at 26.3k rows
  * each GBT tree-level job otherwise schedules dozens of near-empty tasks,
  * and task launch, not compute, dominates (measured at HEAD: default
  * layout 7.6s vs 4.9-5.7s at coalesce(4) for the identical warm fit).
  * A cluster-scale run would leave the layout alone; right-sizing
  * partitions to the data is exactly what a real deployment does at
  * either scale. CAVEAT (measured, BENCH.md "Reference-scale training
  * parity"): MLlib samples ~10k rows for its split-quantile candidates
  * and the sample is partition-dependent, so validation SMAPE on this
  * 23k-row synthetic moves by POINTS across layouts (10.7 at the default
  * 18-partition layout, 12.4-13.6 at coalesce(4), 16.7 at coalesce(8)) —
  * layout noise in the split candidates, not a real quality ranking.
  * Both configs and both layouts are cited in BENCH.md.
  */
object BaselineParity {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // decimal POINTS in every artifact (review finding, r15)
    val spark = Session.getOrCreate()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[parity] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sales = graft.ml.SalesData.generate(spark, "2015-01-01", "2018-12-31")
    println(s"[parity] rows=${sales.count()} (reference: 26,297)")
    val (prepared, _) = timed("feature build + encoder fit")(
      graft.ml.SalesFeatures.prepare(spark, sales))
    val train = prepared.filter(to_date(col("date")) <= lit("2018-06-30"))
      .coalesce(4).cache()
    // cached like train: four smapeOf evaluations consume it, and each
    // would otherwise re-run the synthetic generation + feature pipeline
    // end to end (review finding, r15)
    val valid = prepared.filter(to_date(col("date")) > lit("2018-06-30")).cache()
    train.count(); valid.count()
    def smapeOf(scored: org.apache.spark.sql.DataFrame): Double =
      scored.select(graft.functions.Metrics.smape(col("num_sold"), col("prediction")).cast("double"))
        .head().getDouble(0)

    // flagship default config (the one q63/q64 use), cold then warm: the
    // first MLlib fit in a JVM pays one-time codegen/class-load (~2s);
    // every later fit — i.e. any real pipeline — runs at the warm number
    val modelCold = timed("BoostedHybrid fit, flagship config, run 1 (JVM-cold)")(
      graft.ml.BoostedHybrid().fit(train))
    val model = timed("BoostedHybrid fit, flagship config (15 trees × depth 5), warm")(
      graft.ml.BoostedHybrid().fit(train))
    val smape = timed("predict + SMAPE")(smapeOf(model.transform(valid)))
    println(f"[parity] flagship validation SMAPE: $smape%.2f (cold-fit model: ${smapeOf(modelCold.transform(valid))}%.2f)")

    // parity-scale config: depth 4 — at 26.3k rows the extra level buys no
    // SMAPE (measured: 13.66 vs 13.59 on this layout — equal within the
    // split-sampling noise above) and costs ~20% wall
    val model4 = timed("BoostedHybrid fit, parity config (15 trees × depth 4)")(
      graft.ml.BoostedHybrid(gbtMaxDepth = 4).fit(train))
    println(f"[parity] parity-config validation SMAPE: ${smapeOf(model4.transform(valid))}%.2f")

    // PRODUCTION ensemble shape (kaggle.py:729-778,791): 12-combo grid ×
    // 15 rolling-origin folds feeding the ridge meta-fit + 12 full-train
    // final bases = 192 distributed fits, thread-pooled. metaFolds is left
    // at its all-folds default DELIBERATELY: the reference's
    // StackingRegressor(cv=FOLDS) feeds every fold's OOF rows to the meta
    // fit, and this stage mirrors that classic shape — expect a worse
    // SMAPE than the flagship q64 path, which opts into metaFolds=1
    // because early-fold models train on short prefixes of a trending
    // series (Stacking.fit doc).
    val stack = timed("PRODUCTION stack: 12 combos × 15 folds + ridge meta (192 fits)")(
      graft.ml.Stacking.fit(train, graft.ml.Stacking.productionGrid,
        k = 16, parallelism = 12))
    println(f"[parity] production-stack validation SMAPE: ${smapeOf(stack.transform(valid))}%.2f" +
      " (classic all-folds meta, mirroring the reference's cv=15 — the flagship metaFolds=1 path scores better by design)")
    spark.stop()
  }
}
