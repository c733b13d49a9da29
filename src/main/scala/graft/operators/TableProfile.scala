package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Column profiling — the `ANALYZE TABLE` / data-quality shape every
  * pipeline runs before trusting a new drop: per column, row count, null
  * count, exact distinct count, and canonical min/max. One aggregation
  * pass in long-format output.
  *
  * Min/max canonicalization is what makes the profile cross-engine
  * hashable: doubles go through canonRound → DECIMAL(18,4) → string (both
  * engines format a decimal identically; raw double→string diverges at
  * sci-notation thresholds), timestamps through an explicit format
  * string, integers/strings cast directly.
  *
  * Scale: null/min/max for every column ride ONE keyless aggregation
  * pass (no sort — a grouped agg with string min/max falls to
  * SortAggregate, and the multi-distinct form additionally Expands the
  * input ×#columns: measured 4.1s vs 0.9s at sf0.1 for this profile).
  * Each exact distinct count is its own column-pruned scan + hash agg —
  * columnar parquet makes those near-free, and they run as independent
  * jobs. On a 100 TB table you swap the exact distincts for
  * approx_count_distinct in the same single pass as the min/max (one HLL
  * per column; q27/q98 demonstrate the sketch) and keep this exact form
  * for samples/audits.
  */
object TableProfile {

  /** kind ∈ {bigint, string, double, ts}. `distinctBatch` = how many
    * exact-distinct counts share one aggregation pass: each batch is one
    * column-pruned scan whose multi-distinct Expand multiplies rows by
    * the batch size, so batch=1 is N cheap jobs and batch=N is one
    * Expand-heavy job — measured at sf0.1 (TimeQuery medians, 5 reps,
    * orders profile): batch 1 (the old per-column chain) 0.88s,
    * batch 2 0.85s, batch 3 1.02s, batch 6 1.21s. Batch 2 halves the
    * job count at equal wall time; past that the Expand tax dominates.
    */
  def profile(df: DataFrame, cols: Seq[(String, String)],
              distinctBatch: Int = 2): DataFrame = {
    def minMax(c: String, kind: String): (Column, Column) = kind match {
      case "double" =>
        (Metrics.canonRound(min(col(c)), 4).cast("decimal(18,4)").cast("string"),
          Metrics.canonRound(max(col(c)), 4).cast("decimal(18,4)").cast("string"))
      case "ts" =>
        (date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss"),
          date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss"))
      case _ => (min(col(c)).cast("string"), max(col(c)).cast("string"))
    }
    val aggs = cols.flatMap { case (c, kind) =>
      val (mn, mx) = minMax(c, kind)
      Seq(sum(col(c).isNull.cast("long")).as(s"${c}__nn"),
        mn.as(s"${c}__mn"), mx.as(s"${c}__mx"))
    } :+ count(lit(1)).as("__n")
    val base = df.agg(aggs.head, aggs.tail: _*)
    val wide = cols.map(_._1).grouped(math.max(1, distinctBatch)).foldLeft(base) {
      case (acc, grp) =>
        val nds = grp.map(c => countDistinct(col(c)).as(s"${c}__nd"))
        acc.crossJoin(df.select(grp.map(col): _*).agg(nds.head, nds.tail: _*))
    }
    val stackExpr =
      s"stack(${cols.size}, " + cols.map { case (c, _) =>
        s"'$c', ${c}__nn, ${c}__nd, ${c}__mn, ${c}__mx"
      }.mkString(", ") + ") as (col_name, n_nulls, n_distinct, min_s, max_s)"
    wide.select(col("__n").as("n_rows"), expr(stackExpr))
      .select(col("col_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        col("min_s"), col("max_s"))
      .orderBy("col_name")
  }

  private val ordersCols = Seq(
    "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
    "o_orderstatus" -> "string", "o_totalprice" -> "double",
    "o_orderdate" -> "ts", "o_orderpriority" -> "string")

  val q130 = GQuery(
    "q130_table_profile",
    (s, dir) => profile(Tables.orders(s, dir), ordersCols),
    Some {
      val rows = ordersCols.map { case (c, kind) =>
        val (mn, mx) = kind match {
          case "double" =>
            (s"CAST(CAST(floor(min($c)*1e4+0.5)/1e4 AS DECIMAL(18,4)) AS VARCHAR)",
              s"CAST(CAST(floor(max($c)*1e4+0.5)/1e4 AS DECIMAL(18,4)) AS VARCHAR)")
          case "ts" =>
            (s"strftime(min($c), '%Y-%m-%d %H:%M:%S')",
              s"strftime(max($c), '%Y-%m-%d %H:%M:%S')")
          case _ => (s"CAST(min($c) AS VARCHAR)", s"CAST(max($c) AS VARCHAR)")
        }
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
          CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
          count(DISTINCT $c) AS n_distinct, $mn AS min_s, $mx AS max_s
        FROM orders"""
      }.mkString("\n        UNION ALL ")
      s"""SELECT * FROM (
        $rows)
      ORDER BY col_name"""
    })

  def all: Seq[GQuery] = Seq(q130)
}
