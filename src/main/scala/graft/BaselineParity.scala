package graft

import org.apache.spark.sql.functions._

/** One-off comparison against the reference's only published timing
  * ("3s CPU times" for a single model fit on the 26,297-row dataset,
  * BASELINE.md): generate the same-sized 4-year sales frame, build
  * features + encoders, fit one BoostedHybrid, predict — print wall times.
  */
object BaselineParity {
  def main(args: Array[String]): Unit = {
    val spark = Session.getOrCreate()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[parity] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sales = graft.ml.SalesData.generate(spark, "2015-01-01", "2018-12-31")
    println(s"[parity] rows=${sales.count()} (reference: 26,297)")
    // note: no coalesceTo here — repartitioning perturbs MLlib's floating
    // aggregation order enough to move SMAPE on this small dataset, and
    // the parity number is a quality citation (BENCH.md)
    val (prepared, _) = timed("feature build + encoder fit")(
      graft.ml.SalesFeatures.prepare(spark, sales))
    val train = prepared.filter(to_date(col("date")) <= lit("2018-06-30")).cache()
    val valid = prepared.filter(to_date(col("date")) > lit("2018-06-30"))
    train.count()
    val model = timed("BoostedHybrid fit (linear + GBT residual)")(
      graft.ml.BoostedHybrid().fit(train))
    val smape = timed("predict + SMAPE")(
      model.transform(valid)
        .select(graft.functions.Metrics.smape(col("num_sold"), col("prediction")).cast("double"))
        .head().getDouble(0))
    println(f"[parity] validation SMAPE: $smape%.2f")
    spark.stop()
  }
}
