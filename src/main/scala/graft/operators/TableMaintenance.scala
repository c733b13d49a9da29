package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Lakehouse table-maintenance operators: the jobs that keep a 100 TB
  * table healthy rather than answer questions about it. Compaction
  * planning (the small-files problem) and incremental aggregate-rollup
  * maintenance (apply a delta batch to a materialized summary without a
  * full rebuild) — complements the SCD-2 merge (q116/q136), snapshot
  * diff (q159) and Merkle digests (q164) already in the family.
  */
object TableMaintenance {

  private def cents(c: Column): Column = floor(c * 100 + 0.5).cast("long")

  /** Compaction plan by streaming next-fit: files (synthesized
    * deterministically from the orders table — no real file listing
    * ships with the fixtures) are walked in id order, and a file opens
    * a new compaction group when the running total crosses the target.
    * bin = cum_bytes_before / target in integer division, so the plan
    * is one window cumsum + one agg — no driver loop, no sort beyond
    * the |files| frame (a file listing is ~10⁶ rows at 100 TB: the
    * window runs on the LISTING, never the data; same argument as the
    * STL/series frames).
    *
    * Next-fit (not first-fit-decreasing) on purpose: it preserves file
    * order, so compacted groups stay range-contiguous — what you want
    * when the table is sorted/z-ordered (q125) and stats-pruned.
    */
  def compactionPlan(orders: DataFrame, nFiles: Int, targetBytes: Long): DataFrame = {
    val files = orders
      .groupBy((col("o_orderkey") % nFiles).as("file_id"))
      .agg(sum(cents(col("o_totalprice"))).as("size_bytes"))
    val w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("size_bytes").over(w), lit(0L)))
      .withColumn("bin", (col("cum_before") / lit(targetBytes)).cast("long"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"),
        sum("size_bytes").as("total_bytes"),
        min("file_id").as("first_file"),
        max("file_id").as("last_file"))
      .withColumn("fill_ratio",
        Metrics.canonRound(col("total_bytes").cast("double") / lit(targetBytes.toDouble), 6))
      .orderBy("bin")
  }

  val q178 = GQuery(
    "q178_compaction_plan",
    (s, dir) => compactionPlan(Tables.orders(s, dir), nFiles = 400, targetBytes = 40_000_000L),
    Some("""WITH files AS (
        SELECT o_orderkey % 400 AS file_id,
          sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS size_bytes
        FROM orders GROUP BY 1),
      binned AS (
        SELECT file_id, size_bytes,
          coalesce(sum(size_bytes) OVER (ORDER BY file_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM files)
      SELECT cum_before // 40000000 AS bin,
        count(*) AS n_files,
        sum(size_bytes) AS total_bytes,
        min(file_id) AS first_file,
        max(file_id) AS last_file,
        floor(CAST(sum(size_bytes) AS DOUBLE)/40000000.0*1e6 + 0.5)/1e6 AS fill_ratio
      FROM binned GROUP BY 1 ORDER BY bin"""))

  /** Incremental maintenance of a materialized per-customer rollup: the
    * delta batch (orders with o_orderkey % 10 = 0, standing in for "the
    * new files since the last refresh") merges into the existing
    * summary as partial aggregates — count and sum are mergeable, so
    * the refresh touches only the delta's keys, never the base scan.
    * Output is the refresh CHANGELOG (insert/update rows with their new
    * totals); OpsSpec pins merged ≡ full rebuild, the invariant that
    * makes incremental refresh trustworthy (q136's discipline applied
    * to aggregates).
    *
    * Scale: base rollup and delta partials are both (custkey) hash
    * aggs; the merge is one equi join on the DELTA's key set — at
    * 100 TB the delta is days, the base is years, and this never
    * rescans the years.
    */
  def incrementalRollup(orders: DataFrame): DataFrame = {
    val base = orders.filter(col("o_orderkey") % 10 =!= 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_old"), sum(cents(col("o_totalprice"))).as("rev_old"))
    val delta = orders.filter(col("o_orderkey") % 10 === 0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_delta"), sum(cents(col("o_totalprice"))).as("rev_delta"))
    delta.join(base, Seq("o_custkey"), "left")
      .select(col("o_custkey"),
        when(col("n_old").isNull, lit("insert")).otherwise(lit("update")).as("action"),
        (coalesce(col("n_old"), lit(0L)) + col("n_delta")).as("n_orders"),
        (coalesce(col("rev_old"), lit(0L)) + col("rev_delta")).as("rev_cents"))
      .orderBy("o_custkey")
  }

  val q179 = GQuery(
    "q179_incremental_rollup",
    (s, dir) => incrementalRollup(Tables.orders(s, dir)),
    Some("""WITH base AS (
        SELECT o_custkey, count(*) AS n_old,
          sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS rev_old
        FROM orders WHERE o_orderkey % 10 <> 0 GROUP BY o_custkey),
      delta AS (
        SELECT o_custkey, count(*) AS n_delta,
          sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS rev_delta
        FROM orders WHERE o_orderkey % 10 = 0 GROUP BY o_custkey)
      SELECT d.o_custkey,
        CASE WHEN b.n_old IS NULL THEN 'insert' ELSE 'update' END AS action,
        coalesce(b.n_old, 0) + d.n_delta AS n_orders,
        coalesce(b.rev_old, 0) + d.rev_delta AS rev_cents
      FROM delta d LEFT JOIN base b ON b.o_custkey = d.o_custkey
      ORDER BY d.o_custkey"""))

  def all: Seq[GQuery] = Seq(q178, q179)
}
