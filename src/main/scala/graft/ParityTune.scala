package graft

import org.apache.spark.ml.regression.{GBTRegressor, LinearRegression}
import org.apache.spark.sql.functions._

/** Temporary experiment: where does the 26.3k-row parity fit spend its
  * time (LR vs GBT), and which GBT knobs buy wall without losing SMAPE.
  * Not committed.
  */
object ParityTune {
  def main(args: Array[String]): Unit = {
    val spark = Session.getOrCreate()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tune] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sales = graft.ml.SalesData.generate(spark, "2015-01-01", "2018-12-31")
    val (prepared, _) = graft.ml.SalesFeatures.prepare(spark, sales)
    val valid = prepared.filter(to_date(col("date")) > lit("2018-06-30"))
    def smapeOf(df: org.apache.spark.sql.DataFrame): Double =
      df.select(graft.functions.Metrics.smape(col("num_sold"), col("prediction")).cast("double"))
        .head().getDouble(0)

    for (n <- Seq(0, 4)) {
      val base = prepared.filter(to_date(col("date")) <= lit("2018-06-30"))
      val train = (if (n == 0) base else base.coalesce(n)).cache()
      train.count()
      val lr = new LinearRegression().setFeaturesCol("features").setLabelCol("num_sold")
        .setElasticNetParam(0.0).setRegParam(0.01).setPredictionCol("pred_1")
      val m1 = timed(s"n=$n LR fit")(lr.fit(train))
      val withResid = m1.transform(train)
        .withColumn("resid", col("num_sold") - col("pred_1")).cache()
      withResid.count()
      for ((tag, iter, depth, bins, minInst) <- Seq(
        ("base 15x5x32", 15, 5, 32, 1),
        ("bins16", 15, 5, 16, 1),
        ("depth4", 15, 4, 32, 1),
        ("minInst20", 15, 5, 32, 20),
        ("d4 bins16 mi20", 15, 4, 16, 20))) {
        val gbt = new GBTRegressor().setFeaturesCol("features").setLabelCol("resid")
          .setMaxIter(iter).setMaxDepth(depth).setMaxBins(bins)
          .setMinInstancesPerNode(minInst).setSeed(42L).setPredictionCol("pred_2")
        val m2 = timed(s"n=$n GBT $tag")(gbt.fit(withResid))
        val scored = m2.transform(m1.transform(valid))
          .withColumn("prediction", col("pred_1") + col("pred_2"))
        println(f"[tune] n=$n $tag SMAPE=${smapeOf(scored)}%.2f")
      }
      withResid.unpersist(); train.unpersist()
    }
    spark.stop()
  }
}
