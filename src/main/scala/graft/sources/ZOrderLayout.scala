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
  * Every global ntile here routes through
  * `operators.DistributedRank.ntile` (range repartition +
  * partition-local rank + broadcast offsets — see its scaladoc), so
  * neither rank coding nor file assignment ever plans an
  * `Exchange SinglePartition`; the range exchange per coded dimension is
  * the same shuffle a quantile-boundary pass would pay, and the cuts
  * stay EXACT (the bounding boxes are the oracle-checked output, where
  * approxQuantile boundaries would drift cross-engine). A real lakehouse
  * writer replaces step 2-3 with `repartitionByRange(nFiles, z)` +
  * `sortWithinPartitions(z)` + write and reads the witness from the
  * parquet footers — PlansSpec measures that exact path too.
  */
object ZOrderLayout {

  /** z = interleave(low 16 bits of a, low 16 bits of b); a is major. */
  def zvalue(a: Column, b: Column): Column =
    call_function("graft_zvalue", a.cast("int"), b.cast("int"))

  /** Rank-code dimensions `a` and `b` of `df` to `x`/`y` in
    * [0, levels) (distributed ntile, minus 1), carrying `tieBreak` as
    * `tb`; `tieBreak` must make each order total so codes are
    * deterministic cross-engine.
    */
  def rankCoded(df: DataFrame, a: Column, b: Column, tieBreak: Column, levels: Int): DataFrame = {
    val base = df.select(a.as("__zx_v"), b.as("__zy_v"), tieBreak.as("tb"))
    val xed = graft.operators.DistributedRank.ntile(
      base, Seq(col("__zx_v"), col("tb")), levels, "__zx_t")
    val yed = graft.operators.DistributedRank.ntile(
      xed, Seq(col("__zy_v"), col("tb")), levels, "__zy_t")
    yed.select((col("__zx_t") - 1).cast("int").as("x"),
      (col("__zy_t") - 1).cast("int").as("y"), col("tb"))
  }

  /** Assign `nFiles` z-contiguous files over the (x, y) code space and
    * report each file's row count and bounding box. `tb` must make
    * the total order unique or ntile frontiers are nondeterministic.
    */
  def layoutStats(coded: DataFrame, nFiles: Int): DataFrame = {
    val withFile = graft.operators.DistributedRank.ntile(
      coded.withColumn("z", zvalue(col("x"), col("y"))),
      Seq(col("z"), col("tb")), nFiles, "file_id")
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
