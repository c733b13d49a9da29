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

  /** Up to n rows per group, chosen by a seeded CONTENT hash with a
    * deterministic tie-break. The hash is keyed on the row's columns —
    * not `rand(seed)`, which Spark seeds per PARTITION INDEX, so the
    * "reproducible" sample would silently change with partition layout
    * (parallelism, upstream repartition — review finding, r15; the same
    * instability hashSplit's doc calls out). Content hashing is stable
    * under reruns, repartitioning, and engine versions; duplicate rows
    * tie and fall to `tieBreak` (or an arbitrary-but-harmless pick —
    * fully-equal rows are interchangeable).
    */
  def perGroup(df: DataFrame, groupCols: Seq[String], n: Int,
               seed: Long = 42L, tieBreak: Seq[String] = Nil): DataFrame = {
    // MapType columns are not hashable in Spark (unordered) — leave them
    // out of the draw key rather than failing analysis. Note the draw is
    // keyed on row CONTENT: adding or dropping a (hashable) column
    // changes which rows are sampled, by design — "same seed + same
    // input" includes the schema (follow-up review finding, r15).
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case a: org.apache.spark.sql.types.ArrayType => hasMap(a.elementType)
      case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val hashable = df.schema.fields.filterNot(f => hasMap(f.dataType))
      .map(f => col(f.name)).toSeq
    val h = xxhash64((lit(seed) +: hashable): _*)
    val order: Seq[Column] = h +: tieBreak.map(col)
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
    // null keys hash the sentinel instead of propagating null, which would
    // silently drop the row from BOTH splits (null < n and null >= n are
    // both null → filtered out)
    val keyStr = coalesce(col(keyCol).cast("string"), lit("\u0000null"))
    val bucket = conv(substring(md5(keyStr), 1, 1), 16, 10).cast("int")
    (df.filter(bucket < numerator), df.filter(bucket >= numerator))
  }

  /** Stratified fraction sampling by key (df.sample per stratum). */
  def stratified(df: DataFrame, stratumCol: String, fractions: Map[String, Double],
                 seed: Long = 42L): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
