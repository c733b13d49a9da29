package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** k-anonymity / l-diversity audit with one local-recoding
  * generalization step (Sweeney 2002, "k-anonymity: a model for
  * protecting privacy"; Machanavajjhala et al. 2006, "l-diversity" —
  * public literature). The privacy-audit stage a dataset release
  * pipeline runs BEFORE publishing: group rows into equivalence
  * classes by their quasi-identifiers (attributes an attacker could
  * link externally), flag classes smaller than k (re-identifiable),
  * locally generalize those rows to a coarser QI, and suppress
  * whatever still violates. Complements the existing privacy family:
  * q186/q187 find and redact PII VALUES, q210 propagates deletions;
  * this one measures re-identification RISK of what remains.
  *
  * Model: QI₀ = (nation, market segment, account-balance band of 200);
  * the generalization widens the band to 1000 and drops nation
  * (local recoding — only rows of violating classes re-group; the
  * nested-floor identity floor(x/1000) = floor(floor(x/200)/5) makes
  * the parent class a pure function of the child). Sensitive attribute
  * = the customer's lifetime spend tier from orders (floor(Σ
  * o_totalprice / 5000), −1 for customers with no orders) — an
  * attribute genuinely distinct from every QI, so l-diversity (distinct
  * sensitive values per class) measures real disclosure. k = 5.
  *
  * Output: one row per level-0 equivalence class with its size,
  * l-diversity, and disposition; generalized classes carry their
  * parent's size/l-diversity. The fixture exercises every disposition
  * across the SFs (measured: all three generalize-heavy at sf0.001
  * with 105 suppressed rows, 486 ok classes at sf0.1, generalized-pass
  * everywhere).
  *
  * Scale shape: two map-side-combinable grouped aggregations (class
  * grain ≪ row grain) + one exact-decimal spend rollup; the only join
  * back to rows is rows ⋈ violating-class keys — the class table is
  * orders of magnitude smaller than the data and broadcasts. No
  * windows over the fact table, nothing pairwise.
  */
object KAnonymity {

  private val K = 5

  def audit(customer: DataFrame, orders: DataFrame, k: Int = K): DataFrame = {
    val spend = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(floor(Metrics.exactSum(col("o_totalprice")) / 5000.0).cast("int").as("tier"))
    val base = customer.join(spend, Seq("c_custkey"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"),
        coalesce(col("tier"), lit(-1)).as("tier"),
        floor(col("c_acctbal") / 200.0).cast("int").as("b0"),
        floor(col("c_acctbal") / 1000.0).cast("int").as("b1"))
    val cls0 = base.groupBy("c_nationkey", "c_mktsegment", "b0", "b1")
      .agg(count(lit(1)).as("n0"), countDistinct(col("tier")).as("ldiv0"))
    // class tables are orders of magnitude smaller than the data —
    // broadcast them explicitly (fixture stats planned these as
    // sort-merge; plan-audited)
    val viol = broadcast(cls0.filter(col("n0") < k)
      .select("c_nationkey", "c_mktsegment", "b0"))
    val cls1 = base.join(viol, Seq("c_nationkey", "c_mktsegment", "b0"))
      .groupBy("c_mktsegment", "b1")
      .agg(count(lit(1)).as("n1"), countDistinct(col("tier")).as("ldiv1"))
    cls0.join(broadcast(cls1), Seq("c_mktsegment", "b1"), "left")
      .select(col("c_nationkey"), col("c_mktsegment"), col("b0"),
        col("n0"), col("ldiv0"),
        when(col("n0") < k, col("b1")).as("b1"),
        when(col("n0") < k, col("n1")).as("n1"),
        when(col("n0") < k, col("ldiv1")).as("ldiv1"),
        when(col("n0") >= k, lit("ok"))
          .when(col("n1") < k, lit("suppressed"))
          .otherwise(lit("generalized")).as("status"))
      .orderBy("c_nationkey", "c_mktsegment", "b0")
  }

  val q231 = GQuery(
    "q231_k_anonymity",
    (s, dir) => audit(Tables.customer(s, dir), Tables.orders(s, dir)),
    Some("""WITH spend AS (
        SELECT o_custkey AS c_custkey,
          CAST(floor(CAST(sum(CAST(floor((o_totalprice)*1e4+0.5)/1e4
                 AS DECIMAL(18,4))) AS DOUBLE) / 5000.0) AS INTEGER) AS tier
        FROM orders GROUP BY 1),
      base AS (
        SELECT c.c_nationkey, c.c_mktsegment,
          coalesce(s.tier, -1) AS tier,
          CAST(floor(c.c_acctbal / 200.0) AS INTEGER) AS b0,
          CAST(floor(c.c_acctbal / 1000.0) AS INTEGER) AS b1
        FROM customer c LEFT JOIN spend s ON s.c_custkey = c.c_custkey),
      cls0 AS (
        SELECT c_nationkey, c_mktsegment, b0, b1,
          count(*) AS n0, count(DISTINCT tier) AS ldiv0
        FROM base GROUP BY 1, 2, 3, 4),
      viol AS (SELECT c_nationkey, c_mktsegment, b0 FROM cls0 WHERE n0 < 5),
      cls1 AS (
        SELECT b.c_mktsegment, b.b1,
          count(*) AS n1, count(DISTINCT b.tier) AS ldiv1
        FROM base b
        JOIN viol v ON v.c_nationkey = b.c_nationkey
          AND v.c_mktsegment = b.c_mktsegment AND v.b0 = b.b0
        GROUP BY 1, 2),
      rep AS (
        SELECT c0.c_nationkey, c0.c_mktsegment, c0.b0, c0.n0, c0.ldiv0,
          CASE WHEN c0.n0 < 5 THEN c0.b1 END AS b1,
          CASE WHEN c0.n0 < 5 THEN c1.n1 END AS n1,
          CASE WHEN c0.n0 < 5 THEN c1.ldiv1 END AS ldiv1,
          CASE WHEN c0.n0 >= 5 THEN 'ok'
               WHEN c1.n1 < 5 THEN 'suppressed'
               ELSE 'generalized' END AS status
        FROM cls0 c0
        LEFT JOIN cls1 c1
          ON c1.c_mktsegment = c0.c_mktsegment AND c1.b1 = c0.b1)
      SELECT c_nationkey, c_mktsegment, b0, n0, ldiv0, b1, n1, ldiv1, status
      FROM rep ORDER BY c_nationkey, c_mktsegment, b0"""))

  val all: Seq[GQuery] = Seq(q231)
}
