package graft.ml

import org.apache.spark.ml.feature.UnivariateFeatureSelector
import org.apache.spark.sql.DataFrame

/** Univariate feature selection (E17 — the reference only ever declared an
  * MI threshold constant, kaggle/kaggle.py:80; this is the working MLlib
  * equivalent: F-regression scoring for continuous features + label).
  */
object FeatureSelection {

  def selectTopK(df: DataFrame, featuresCol: String, labelCol: String, k: Int,
                 outputCol: String = "selected_features"): DataFrame = {
    val sel = new UnivariateFeatureSelector()
      .setFeatureType("continuous").setLabelType("continuous") // F-regression
      .setSelectionMode("numTopFeatures").setSelectionThreshold(k)
      .setFeaturesCol(featuresCol).setLabelCol(labelCol).setOutputCol(outputCol)
    sel.fit(df).transform(df)
  }
}
