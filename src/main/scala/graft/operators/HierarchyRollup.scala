package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Hierarchical subtree rollup via RECURSIVE CTE — the classic
  * warehouse hierarchy problem (BOM explosion, org-chart rollup,
  * category-tree totals): for EVERY node of a tree, the size, value
  * sum, and height of its subtree, in one query.
  *
  * Spark 4 executes WITH RECURSIVE natively (UnionLoop — each
  * iteration joins the frontier against the base, exactly the
  * frontier-expansion loop BfsDistance hand-rolls); this query
  * exercises that SQL surface end-to-end against DuckDB's recursive
  * CTE on identical text. The complement of q204's pointer doubling:
  * recursion walks DEPTH rounds (right for trees, whose depth is
  * log n; 15 here), doubling walks log2(longest chain) rounds (right
  * for long chains and cycle detection, where depth-bounded recursion
  * would need |V| rounds or silently truncate).
  *
  * Shape at 100 TB: the expansion materializes node×ancestor pairs —
  * n·depth rows (n·log n for balanced trees), each iteration one
  * equi-join + union; the rollup is then a single hash aggregation by
  * ancestor. Value sums use the exactSum decimal idiom so the rollup
  * is partition-order-free.
  *
  * The tree: parts arranged as a 0-rooted binary heap
  * (parent(k) = (k−1) DIV 2) — deterministic, balanced, depth
  * ⌈log2 n⌉, every key present at every SF.
  */
object HierarchyRollup {

  val q209 = GQuery(
    "q209_hierarchy_rollup",
    (s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("part_q209")
      s.sql(sql("part_q209"))
    },
    Some(sql("part")))

  /** Shared query text — Spark and DuckDB run the SAME recursive SQL.
    * The heap parent is spelled FLOOR((anc−1)/2.0) because the two
    * dialects disagree on an integer-division operator (Spark DIV,
    * DuckDB //); the double form is exact here (values ≪ 2^52) and
    * parses in both. Public so specs can drive constructed trees
    * through the identical text.
    */
  def sql(table: String): String =
    s"""WITH RECURSIVE anc AS (
        SELECT p_partkey AS node, p_partkey AS anc, CAST(0 AS INT) AS d,
               p_retailprice AS price
        FROM $table
        UNION ALL
        SELECT node, CAST(FLOOR((anc - 1) / 2.0) AS BIGINT) AS anc, d + 1, price
        FROM anc WHERE anc > 0
      )
      SELECT anc AS node,
             COUNT(*) AS n_desc,
             CAST(SUM(CAST(FLOOR(price * 1e4 + 0.5) / 1e4 AS DECIMAL(18,4))) AS DOUBLE)
               AS subtree_value,
             MAX(d) AS subtree_height
      FROM anc GROUP BY anc ORDER BY node"""

  def all: Seq[GQuery] = Seq(q209)
}
