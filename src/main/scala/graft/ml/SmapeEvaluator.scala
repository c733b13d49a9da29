package graft.ml

import org.apache.spark.ml.evaluation.Evaluator
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

import graft.functions.Metrics

/** SMAPE as an MLlib Evaluator (E12, kaggle/kaggle.py:109-131) so it plugs
  * into CrossValidator / TrainValidationSplit. Lower is better.
  */
class SmapeEvaluator(override val uid: String) extends Evaluator {
  def this() = this(Identifiable.randomUID("smapeEval"))

  val labelCol = new Param[String](this, "labelCol", "label column")
  val predictionCol = new Param[String](this, "predictionCol", "prediction column")
  setDefault(labelCol -> "num_sold", predictionCol -> "prediction")

  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setPredictionCol(v: String): this.type = set(predictionCol, v)

  override def evaluate(ds: Dataset[_]): Double = {
    val r = ds.select(Metrics.smape(col($(labelCol)), col($(predictionCol))).cast("double"))
      .head()
    // an empty validation slice aggregates to NULL — fail with a message
    // instead of an opaque NPE deep inside a CV sweep (review finding, r15)
    require(!r.isNullAt(0),
      "SMAPE over zero rows — the evaluation dataset is empty (check the fold split)")
    r.getDouble(0)
  }

  override def isLargerBetter: Boolean = false
  override def copy(extra: ParamMap): SmapeEvaluator = defaultCopy(extra)
}

/** SMAPE-minimizing scale correction (E13, kaggle/kaggle.py:497-523):
  * sweep a multiplicative weight grid, pick the argmin — expressed as a
  * broadcast crossJoin + groupBy, never a driver loop over data.
  */
object ScaleCorrection {
  import org.apache.spark.sql.{DataFrame, SparkSession}
  import org.apache.spark.sql.functions._

  def bestWeight(preds: DataFrame, labelCol: String, predCol: String,
                 lo: Double = 0.97, hi: Double = 1.02, step: Double = 1e-3): (Double, Double) = {
    val spark = preds.sparkSession
    import spark.implicits._
    // `to` (inclusive): the sweep must evaluate the hi endpoint too
    val n = math.round((hi - lo) / step).toInt
    val grid = (0 to n).map(i => math.rint((lo + i * step) * 1e6) / 1e6).toDF("weight")
    val scored = preds.crossJoin(broadcast(grid))
      .groupBy("weight")
      .agg(Metrics.smape(col(labelCol), col(predCol) * col("weight")).as("smape"))
      .orderBy(col("smape").asc, col("weight").asc)
      .head()
    (scored.getDouble(0), scored.getDouble(1))
  }
}
