package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join for two LARGE sides.
  *
  * Catalyst plans a pure inequality join as a nested-loop/cartesian —
  * fine when one side broadcasts (q12's band join), fatal when both sides
  * are big. The standard scale-out technique (used by Flink interval
  * joins and warehouse range-join optimizations): quantize time into
  * fixed-width bins; replicate each interval into every bin it covers;
  * equi-join points to intervals on (keys…, bin); re-apply the exact
  * predicate. A point lies in exactly one bin, so no pair is produced
  * twice; an interval spanning b bins is replicated b times — cost scales
  * with Σ span/binWidth, never |points| × |intervals|.
  */
object RangeJoin {

  /** Inner point-in-interval join: rows (point ⋈ interval) where
    * lo <= point <= hi and all key columns match.
    *
    * @param points     side with the point timestamp column `pointTs`
    * @param intervals  side with `loTs` / `hiTs` timestamp columns
    * @param keys       equi-key columns present on both sides
    * @param binSeconds bin width; pick ≳ the typical interval span so most
    *                   intervals replicate into ≤ 2 bins
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointTs: String, loTs: String, hiTs: String,
                      keys: Seq[String], binSeconds: Long): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    val reserved = "__bin"
    require(!(points.columns ++ intervals.columns).contains(reserved),
      s"inputs may not contain a $reserved column")
    val binMicros = binSeconds * 1000000L
    // exact floor division: (x − pmod(x, w)) is an exact multiple of w, so
    // the double division is exact (correctly-rounded integer quotient) —
    // a plain floor(x/w) could mis-bin values sitting on a bin boundary.
    // pmod (not %) keeps the floor semantics for pre-1970 timestamps.
    def bin(c: org.apache.spark.sql.Column) = {
      val x = unix_micros(c)
      ((x - pmod(x, lit(binMicros))) / binMicros).cast("long")
    }
    val p = points.withColumn(reserved, bin(col(pointTs)))
    val i = intervals.withColumn(reserved,
      explode(sequence(bin(col(loTs)), bin(col(hiTs)))))
    p.join(i, keys :+ reserved)
      .filter(col(pointTs) >= col(loTs) && col(pointTs) <= col(hiTs))
      .drop(reserved)
  }
}
