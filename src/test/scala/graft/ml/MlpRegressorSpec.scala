package graft.ml

import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the Spark-native MLP regressor (SURVEY E7): it must LEARN a
  * planted nonlinear function a linear model cannot represent, its
  * codegen scoring expression must agree with a driver-side forward
  * pass, and the BoostedHybrid "mlp" stage must run end to end. Layout
  * is pinned (coalesce) because the float gradient sum is
  * partition-order-dependent — the documented MLlib-GBT class.
  */
class MlpRegressorSpec extends SparkSpec {

  // planted target: y = sin(3·x1) + x2² — zero linear signal in x2,
  // strong curvature everywhere; deterministic grid inputs
  private lazy val planted = {
    import spark.implicits._
    val rows = for (i <- 0 until 2000) yield {
      val x1 = (i % 50) / 25.0 - 1.0        // [-1, 1)
      val x2 = ((i / 50) % 40) / 20.0 - 1.0 // [-1, 1)
      (i.toLong, x1, x2, math.sin(3 * x1) + x2 * x2)
    }
    val df = rows.toDF("id", "x1", "x2", "y")
    new VectorAssembler().setInputCols(Array("x1", "x2")).setOutputCol("features")
      .transform(df).coalesce(4).cache()
  }

  private def rmse(scored: org.apache.spark.sql.DataFrame, pred: String): Double =
    math.sqrt(scored.select(avg(pow(col("y") - col(pred), 2))).head().getDouble(0))

  test("learns a planted nonlinear function far better than a linear fit") {
    val train = planted.filter(col("id") % 5 =!= 0)
    val test = planted.filter(col("id") % 5 === 0)
    val mlp = MlpRegressor(labelCol = "y", predictionCol = "p_mlp",
      hidden = 16, epochs = 300, lr = 0.5).fit(train)
    val lin = new org.apache.spark.ml.regression.LinearRegression()
      .setFeaturesCol("features").setLabelCol("y").setPredictionCol("p_lin")
      .fit(train)
    val scored = lin.transform(mlp.transform(test)).cache()
    val (eMlp, eLin) = (rmse(scored, "p_mlp"), rmse(scored, "p_lin"))
    scored.unpersist()
    // the linear model is stuck near the target's std (~0.66); the MLP
    // must cut the error at least in half
    assert(eMlp < 0.5 * eLin, s"mlp $eMlp vs linear $eLin")
    assert(eMlp < 0.25, s"mlp rmse $eMlp")
  }

  test("codegen scoring expression matches a driver-side forward pass") {
    val m = MlpRegressor(labelCol = "y", hidden = 4, epochs = 30, lr = 0.3)
      .fit(planted)
    // ONE limited execution carrying inputs and prediction together —
    // two independent limit(50) runs have no shared row-selection
    // guarantee (a plan change could pick different rows and turn a
    // map-key miss into a spurious failure)
    val rows = m.transform(planted.limit(50))
      .select(col("id"), col("x1"), col("x2"), col("pred_1")).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val xs = Array(r.getDouble(1), r.getDouble(2))
      val std = xs.indices.map(i => (xs(i) - m.mean(i)) / m.std(i))
      val z = m.w2.indices.map { j =>
        m.w2(j) * math.tanh(m.b1(j) +
          std.indices.map(i => m.w1(j)(i) * std(i)).sum)
      }.sum + m.b2
      val expect = m.yMean + m.yStd * z
      assert(math.abs(r.getDouble(3) - expect) < 1e-9,
        s"id ${r.getLong(0)}: expr ${r.getDouble(3)} vs $expect")
    }
  }

  test("BoostedHybrid stage1 = mlp runs end to end and carries signal") {
    val train = planted.filter(col("id") % 5 =!= 0)
      .withColumnRenamed("y", "num_sold")
    val test = planted.filter(col("id") % 5 === 0)
      .withColumnRenamed("y", "num_sold")
    val model = BoostedHybrid(stage1 = "mlp", mlpHidden = 8, mlpEpochs = 120,
      mlpLr = 0.5, gbtMaxIter = 5, gbtMaxDepth = 3).fit(train)
    val scored = model.transform(test)
      .select(avg(pow(col("num_sold") - col("prediction"), 2))).head().getDouble(0)
    assert(math.sqrt(scored) < 0.35, s"hybrid rmse ${math.sqrt(scored)}")
  }
}
