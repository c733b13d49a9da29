package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-wise sampling (A1, kaggle/kaggle.py:424:
  * groupby(y).apply(sample(min(len,5)))) — expressed as a seeded-random
  * ranking window, fully distributed, reproducible for a fixed seed +
  * input.
  */
object Sampling {

  /** Up to n rows per group, chosen by rand(seed) with a deterministic
    * tie-break.
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], n: Int,
               seed: Long = 42L, tieBreak: Seq[String] = Nil): DataFrame = {
    val order: Seq[Column] = rand(seed) +: tieBreak.map(col)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn")
  }

  /** Deterministic hash split (train/holdout) on a key column: stable under
    * reruns, repartitioning, AND data growth — the property a 100 TB
    * training pipeline needs from its split (row-level rand() has none of
    * them). md5-based so any engine reproduces the assignment.
    *
    * @param numerator keep rows whose first hex digit of md5(key) is
    *                  < numerator (fraction = numerator/16)
    */
  def hashSplit(df: DataFrame, keyCol: String, numerator: Int): (DataFrame, DataFrame) = {
    val bucket = conv(substring(md5(col(keyCol).cast("string")), 1, 1), 16, 10).cast("int")
    (df.filter(bucket < numerator), df.filter(bucket >= numerator))
  }

  /** Stratified fraction sampling by key (df.sample per stratum). */
  def stratified(df: DataFrame, stratumCol: String, fractions: Map[String, Double],
                 seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
