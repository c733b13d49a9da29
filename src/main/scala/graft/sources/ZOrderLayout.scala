package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Metrics

/** Z-order (Morton-curve) data layout — the multi-column clustering step a
  * 100 TB table needs so that min/max footer stats prune files for
  * predicates on EITHER clustered column (Delta/Iceberg `OPTIMIZE ZORDER`).
  * A single-column sort bounds one dimension per file and leaves every
  * file spanning the other dimension's full domain; interleaving the
  * dimensions' bits gives each file a tile that is narrow in BOTH.
  *
  * The interleave itself is `plans.ZValueExpr` (whole-stage-codegen'd
  * Morton spread); this object supplies the layout pipeline around it:
  *
  *  1. '''Rank coding''' — each dimension is quantized to its ntile rank
  *     (0..levels-1), not its raw value. Interleaving raw values is wrong
  *     whenever domains differ in width (a 12-bit day domain against a
  *     7-bit customer domain degenerates into a day-sort: the wide
  *     dimension's high bits dominate the z order) or are skewed; ranks
  *     are uniform by construction, so the curve tiles the occupied space
  *     evenly no matter the distributions.
  *  2. '''File assignment''' — ntile over the z order cuts z-contiguous
  *     files.
  *  3. '''Bounding-box witness''' — per-file min/max of both dimension
  *     codes: exactly the footer stats a lakehouse writer persists, i.e.
  *     the numbers that decide file skipping.
  *
  * The window-function form here is the oracle-friendly witness; at scale
  * the same three steps are shuffle-shaped, not window-shaped: rank coding
  * = quantile boundaries from one `approxQuantile`-style pass, broadcast
  * and applied map-side; file assignment = `repartitionByRange(nFiles, z)`
  * + `sortWithinPartitions(z)` + write (one range shuffle, no global
  * window); the witness comes free in the parquet footers.
  */
object ZOrderLayout {

  /** z = interleave(low 16 bits of a, low 16 bits of b); a is major. */
  def zvalue(a: Column, b: Column): Column =
    call_function("graft_zvalue", a.cast("int"), b.cast("int"))

  /** ntile rank of `v` in [0, levels), tie-broken to a total order so the
    * code is deterministic cross-engine.
    */
  def rankCode(v: Column, tieBreak: Column, levels: Int): Column =
    (ntile(levels).over(Window.orderBy(v, tieBreak)) - 1).cast("int")

  /** Assign `nFiles` z-contiguous files over the (x, y) code space and
    * report each file's row count and bounding box. `tieBreak` must make
    * the total order unique or ntile frontiers are nondeterministic.
    */
  def layoutStats(coded: DataFrame, nFiles: Int): DataFrame = {
    val withFile = coded
      .withColumn("z", zvalue(col("x"), col("y")))
      .withColumn("file_id", ntile(nFiles).over(Window.orderBy(col("z"), col("tb"))))
    withFile.groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        min("x").as("x_min"), max("x").as("x_max"),
        min("y").as("y_min"), max("y").as("y_max"),
        min("z").as("z_min"), max("z").as("z_max"))
      .orderBy("file_id")
  }

  /** DuckDB-side Morton interleave: 32 plain arithmetic terms, bit i of
    * `x` at position 2i+1 and of `y` at 2i — exactly ZValueExpr's
    * semantics, so z-ordered layouts hash-verify cross-engine.
    */
  def interleaveSql(x: String, y: String): String =
    (0 until 16).map { i =>
      val bit = 1L << i
      s"((($x)//$bit)%2)*${1L << (2 * i + 1)} + ((($y)//$bit)%2)*${1L << (2 * i)}"
    }.mkString(" + ")

  /** Mean per-file extent of each dimension as a fraction of its global
    * extent — the skipping metric: a predicate on a dimension scans, in
    * expectation, roughly (mean extent fraction) of the files. A
    * single-column sort scores ~1/nFiles on its own dimension and ~1.0 on
    * the other; z-order scores ~1/√nFiles on BOTH.
    */
  def meanExtentFractions(stats: DataFrame): (Double, Double) = {
    val g = stats.agg(
        avg(col("x_max") - col("x_min") + 1).as("mx"),
        avg(col("y_max") - col("y_min") + 1).as("my"),
        (max("x_max") - min("x_min") + 1).cast("double").as("gx"),
        (max("y_max") - min("y_min") + 1).cast("double").as("gy"))
      .head()
    (g.getDouble(0) / g.getDouble(2), g.getDouble(1) / g.getDouble(3))
  }
}
