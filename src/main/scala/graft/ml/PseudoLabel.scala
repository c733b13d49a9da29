package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pseudo-labeling flow (E14, kaggle/kaggle.py:91-94, 409-416): take a
  * prior model's predictions over the unlabeled frame, attach them as
  * labels by row_id equi-join (never positional alignment — SURVEY.md
  * §1.3/§7.4 item 6), and union with the labeled training set.
  */
object PseudoLabel {

  /** @param train    labeled frame (has labelCol)
    * @param unlabeled frame without labels (test-shaped)
    * @param priorPreds (row_id, labelCol) from an earlier model/submission
    */
  def augment(train: DataFrame, unlabeled: DataFrame, priorPreds: DataFrame,
              labelCol: String = "num_sold", idCol: String = "row_id"): DataFrame = {
    val labeled = unlabeled.join(
      priorPreds.select(col(idCol), col(labelCol).as(s"__pseudo_$labelCol")), Seq(idCol), "inner")
      .withColumn(labelCol, col(s"__pseudo_$labelCol"))
      .drop(s"__pseudo_$labelCol")
      .withColumn("is_pseudo", lit(true))
    train.withColumn("is_pseudo", lit(false))
      .unionByName(labeled.select(train.columns.map(col) :+ col("is_pseudo"): _*))
  }
}
