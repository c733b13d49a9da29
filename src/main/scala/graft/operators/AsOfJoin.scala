package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right row
  * with the same key and rightTime <= leftTime.
  *
  * Spark has no native ASOF JOIN; the preference ladder (SURVEY.md §4.3 /
  * builder brief) says compose built-ins before writing a custom
  * SparkPlan — and the union+window composition is exactly the shape a
  * custom physical operator would execute anyway: ONE shuffle on (key),
  * one in-partition ordered sweep carrying O(1) state (the running last
  * right row). A custom `AsOfJoinExec` would only shave the union overhead.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      reference side (its columns arrive prefixed)
    * @param key        equi key column name (same on both sides)
    * @param leftTime   event-time column on left
    * @param rightTime  event-time column on right
    * @param rightCols  right columns to carry (besides key/time)
    * @param prefix     prefix for carried right columns
    */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           rightCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val reserved = Set("__t", "__tag", "__ref", "__match")
    require(!(leftCols ++ rightCols).exists(reserved),
      s"asof: input columns may not use reserved names ${reserved.mkString(", ")}")
    // tag 0 = right (reference), 1 = left (probe); at equal timestamps the
    // reference row sorts first, so rightTime == leftTime matches (>= match)
    val rSel: Seq[Column] =
      Seq(col(key), col(rightTime).as("__t"), lit(0).as("__tag"),
        struct((rightTime +: rightCols).map(col): _*).as("__ref")) ++
        leftCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c))
    val r = right.select(rSel: _*)
    val lSel: Seq[Column] =
      Seq(col(key), col(leftTime).as("__t"), lit(1).as("__tag"),
        lit(null).cast(r.schema("__ref").dataType).as("__ref")) ++
        leftCols.filterNot(_ == key).map(col)
    val l = left.select(lSel: _*)
    // __ref as the final sort key makes ties deterministic: multiple right
    // rows with identical (key, rightTime) order by their carried payload
    // (struct ordering), so last() always resolves to the max payload rather
    // than an arbitrary partition-order-dependent row. Requires rightCols to
    // be orderable types (true of everything in the workload).
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__tag"), col("__ref"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = r.unionByName(l)
      .withColumn("__match", last(col("__ref"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val carried = (rightTime +: rightCols).map(c =>
      col(s"__match.$c").as(s"$prefix$c"))
    matched.select(leftCols.map(col) ++ carried: _*)
  }
}
