package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Metrics
import graft.registry.GQuery

/** Relational operator coverage (SURVEY.md §2.1-2.6): scans, filters,
  * projections, joins (broadcast/semi/anti/range/band), unions, group-by
  * aggregation, rollup, windows, top-n — each as a deterministic query with
  * a DuckDB oracle.
  *
  * Scale notes are per-query; the common ones: dimension joins are
  * `broadcast()` (region/nation/customer/bands all stay tiny relative to the
  * fact tables even at 100 TB — customer would graduate to a shuffle join,
  * which Catalyst/AQE picks automatically once it exceeds
  * autoBroadcastJoinThreshold), aggregations are partial+final (map-side
  * combine) by construction, and every scan prunes columns + pushes filters
  * into the parquet reader.
  */
object RelationalQueries {

  /** TPC-H Q1-shaped pricing summary: full scan, map-side partial agg on a
    * 6-value grouping key — shuffle is 6 rows × partitions regardless of SF.
    */
  val q01 = GQuery(
    "q01_pricing_summary",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      l.filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          graft.functions.Metrics.canonRound(sum("l_quantity"), 2).as("sum_qty"),
          graft.functions.Metrics.canonRound(Metrics.exactSum(col("l_extendedprice")), 2).as("sum_base_price"),
          graft.functions.Metrics.canonRound(Metrics.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          graft.functions.Metrics.canonRound(Metrics.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          graft.functions.Metrics.canonRound(avg("l_quantity"), 4).as("avg_qty"),
          graft.functions.Metrics.canonRound(Metrics.exactMean(col("l_extendedprice")), 4).as("avg_price"),
          graft.functions.Metrics.canonRound(Metrics.exactMean(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      floor((sum(l_quantity)) * 1e2 + 0.5)/1e2 AS sum_qty,
      floor((CAST(sum(CAST(floor((l_extendedprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS sum_base_price,
      floor((CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS sum_disc_price,
      floor((CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)*(1+l_tax)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS sum_charge,
      floor((avg(l_quantity)) * 1e4 + 0.5)/1e4 AS avg_qty,
      floor((CAST(sum(CAST(floor((l_extendedprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*)) * 1e4 + 0.5)/1e4 AS avg_price,
      floor((CAST(sum(CAST(floor((l_discount) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*)) * 1e4 + 0.5)/1e4 AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""))

  /** Projection + conjunctive filter + date range (P1-P3). Both the
    * predicate and the 4-column projection push into the parquet scan.
    */
  val q02 = GQuery(
    "q02_filter_project",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_returnflag") === "R" &&
          to_date(col("l_shipdate")).between("1996-01-01", "1997-12-31") &&
          col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        // (l_orderkey, l_linenumber) is NOT unique in the fixtures — sort by
        // every output column so tied rows are interchangeable under hashing
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_returnflag = 'R'
        AND CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        AND l_quantity > 30
      ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice"""))

  /** TPC-H Q3-shaped 3-table join. customer is broadcast (dim); the
    * orders⋈lineitem join shuffles on orderkey — the natural co-partition
    * key for both tables at scale (bucketing candidate).
    */
  val q03 = GQuery(
    "q03_join_agg",
    (s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir).filter(year(col("o_orderdate")) === 1996)
      val l = Tables.lineitem(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        // timestamp_ntz: the cross-engine-stable output type for dates
        // (naive micros on both sides; DATE surfaces differently per reader)
        .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).cast("timestamp_ntz").as("order_date"))
        .agg(graft.functions.Metrics.canonRound(Metrics.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("l_orderkey")
    },
    Some("""SELECT l_orderkey, CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS order_date,
      floor((CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS revenue,
      count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING' AND year(o_orderdate) = 1996
      GROUP BY 1, 2
      ORDER BY l_orderkey"""))

  /** Conditional projection + math scalar functions (P6, M2, M4): CASE,
    * log1p, sqrt/floor/ceil geometric rounding (kaggle/kaggle.py:837-842).
    */
  val q04 = GQuery(
    "q04_case_math",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("small").as("size_class"),
          graft.functions.Metrics.canonRound(log1p(col("o_totalprice")), 6).as("log_price"),
          Metrics.geometricRound(col("o_totalprice") / 1000.0).as("geo_round"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      CASE WHEN o_totalprice > 200000 THEN 'big'
           WHEN o_totalprice > 50000 THEN 'mid'
           ELSE 'small' END AS size_class,
      floor((ln(1 + o_totalprice)) * 1e6 + 0.5)/1e6 AS log_price,
      CASE WHEN o_totalprice/1000.0 < sqrt(floor(o_totalprice/1000.0)*ceil(o_totalprice/1000.0))
           THEN floor(o_totalprice/1000.0) ELSE ceil(o_totalprice/1000.0) END AS geo_round
      FROM orders ORDER BY o_orderkey"""))

  /** Vertical union with provenance tag (U1, kaggle/kaggle.py:415-416).
    * unionByName — column-name resolved, so schema drift between branches
    * fails fast instead of silently mis-aligning.
    */
  val q05 = GQuery(
    "q05_union",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), lit("y1995").as("src"))
      val b = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_orderkey"), lit("y1996").as("src"))
      a.unionByName(b).orderBy("o_orderkey", "src")
    },
    Some("""SELECT o_orderkey, 'y1995' AS src FROM orders WHERE year(o_orderdate)=1995
      UNION ALL
      SELECT o_orderkey, 'y1996' AS src FROM orders WHERE year(o_orderdate)=1996
      ORDER BY o_orderkey, src"""))

  /** Distinct aggregation (A6). countDistinct expands to a two-phase
    * partial/final plan; at 100 TB swap to approx_count_distinct (HLL) when
    * exactness isn't required.
    */
  val q06 = GQuery(
    "q06_distinct_agg",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
      count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Filter over an aggregate = HAVING (P4, kaggle/kaggle.py:422-423). */
  val q07 = GQuery(
    "q07_having",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          graft.functions.Metrics.canonRound(Metrics.exactSum(col("o_totalprice")), 2).as("total_spend"))
        .filter(col("n_orders") >= 12)
        .orderBy("o_custkey"),
    Some("""SELECT o_custkey, count(*) AS n_orders,
      floor((CAST(sum(CAST(floor((o_totalprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS total_spend
      FROM orders GROUP BY o_custkey HAVING count(*) >= 12 ORDER BY o_custkey"""))

  /** Per-group top-n via ranking window (A1, kaggle/kaggle.py:424 —
    * deterministic orderBy instead of sample). One shuffle on the partition
    * key; no driver involvement.
    */
  val q08 = GQuery(
    "q08_topn_per_group",
    (s, dir) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      Tables.customer(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("c_nationkey", "rn", "c_custkey", "c_acctbal")
        .orderBy("c_nationkey", "rn")
    },
    Some("""SELECT c_nationkey, CAST(rn AS INTEGER) AS rn, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
        FROM customer) t
      WHERE rn <= 3 ORDER BY c_nationkey, rn"""))

  /** Column null audit (A2, kaggle/kaggle.py:422): one pass, one row out. */
  val q09 = GQuery(
    "q09_null_audit",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      c.agg(
        count(lit(1)).as("n_rows"),
        sum(col("c_name").isNull.cast("long")).as("c_name_nulls"),
        sum(col("c_acctbal").isNull.cast("long")).as("c_acctbal_nulls"),
        sum(col("c_mktsegment").isNull.cast("long")).as("c_mktsegment_nulls"))
    },
    Some("""SELECT count(*) AS n_rows,
      count(*) - count(c_name) AS c_name_nulls,
      count(*) - count(c_acctbal) AS c_acctbal_nulls,
      count(*) - count(c_mktsegment) AS c_mktsegment_nulls
      FROM customer"""))

  /** Group statistics incl. exact median (A3/A4, kaggle/kaggle.py:851,144).
    * Exact median is required for oracle parity (SURVEY.md §5.2); at 100 TB
    * prefer percentile_approx for a single-pass sketch.
    */
  val q10 = GQuery(
    "q10_group_stats",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(graft.functions.Metrics.canonRound(avg("l_quantity"), 4).as("avg_qty"),
          graft.functions.Metrics.canonRound(median(col("l_quantity")), 2).as("median_qty"),
          graft.functions.Metrics.canonRound(min("l_quantity"), 2).as("min_qty"),
          graft.functions.Metrics.canonRound(max("l_quantity"), 2).as("max_qty"),
          graft.functions.Metrics.canonRound(stddev("l_quantity"), 4).as("std_qty"))
        .orderBy("l_returnflag", "l_linestatus"),
    Some("""SELECT l_returnflag, l_linestatus,
      floor((avg(l_quantity)) * 1e4 + 0.5)/1e4 AS avg_qty,
      floor((median(l_quantity)) * 1e2 + 0.5)/1e2 AS median_qty,
      floor((min(l_quantity)) * 1e2 + 0.5)/1e2 AS min_qty,
      floor((max(l_quantity)) * 1e2 + 0.5)/1e2 AS max_qty,
      floor((stddev(l_quantity)) * 1e4 + 0.5)/1e4 AS std_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Calendar extraction (D1-D7) incl. both weekday conventions — the
    * pandas-vs-Spark offset trap made explicit (SURVEY.md §7.4 item 3).
    */
  val q11 = GQuery(
    "q11_date_features",
    (s, dir) =>
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          dayofweek(col("o_orderdate")).as("dow_sun1"),
          graft.functions.DateFeatures.weekdayMon0(col("o_orderdate")).as("wd_mon0"),
          dayofyear(col("o_orderdate")).as("doy"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("days_since"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"))
        .orderBy("o_orderkey"),
    Some("""SELECT o_orderkey,
      CAST(year(o_orderdate) AS INTEGER) AS y,
      CAST(month(o_orderdate) AS INTEGER) AS m,
      CAST(day(o_orderdate) AS INTEGER) AS d,
      CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
      CAST(isodow(o_orderdate) - 1 AS INTEGER) AS wd_mon0,
      CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
      FROM orders ORDER BY o_orderkey"""))

  /** Band (theta) join against a literal dimension — non-equi join on value
    * ranges. The band table is 4 rows → broadcast nested loop, which is the
    * right plan at any scale.
    */
  val q12 = GQuery(
    "q12_band_join",
    (s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("neg", Double.NegativeInfinity, 0.0),
        ("low", 0.0, 3000.0),
        ("mid", 3000.0, 7000.0),
        ("high", 7000.0, Double.PositiveInfinity)
      ).toDF("band", "lo", "hi")
      Tables.customer(s, dir)
        .join(broadcast(bands), col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
        .groupBy("band")
        .agg(count(lit(1)).as("n_customers"),
          graft.functions.Metrics.canonRound(Metrics.exactMean(col("c_acctbal")), 4).as("avg_bal"))
        .orderBy("band")
    },
    Some("""SELECT band, count(*) AS n_customers,
      floor((CAST(sum(CAST(floor((c_acctbal) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*)) * 1e4 + 0.5)/1e4 AS avg_bal
      FROM customer
      JOIN (VALUES ('neg', -1e308, 0.0), ('low', 0.0, 3000.0),
                   ('mid', 3000.0, 7000.0), ('high', 7000.0, 1e308)) AS b(band, lo, hi)
        ON c_acctbal >= lo AND c_acctbal < hi
      GROUP BY band ORDER BY band"""))

  /** Interval-offset range join (J6, kaggle/kaggle.py:296-329): equi-join on
    * the key plus a datediff window predicate.
    */
  val q13 = GQuery(
    "q13_range_join",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).between(0, 30))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_shipped_30d"),
          graft.functions.Metrics.canonRound(avg(datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))), 4).as("avg_lag_days"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_shipped_30d,
      floor((avg(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))) * 1e4 + 0.5)/1e4 AS avg_lag_days
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) BETWEEN 0 AND 30
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Hierarchical rollup (free from Catalyst — SURVEY.md §2.5). Grouping
    * nulls are labeled 'ALL' so null-ordering semantics can't diverge
    * between engines.
    */
  val q14 = GQuery(
    "q14_rollup",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(graft.functions.Metrics.canonRound(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty"), col("n"))
        .orderBy("returnflag", "linestatus"),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      coalesce(l_linestatus, 'ALL') AS linestatus,
      floor((sum(l_quantity)) * 1e2 + 0.5)/1e2 AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  /** Left-semi join = EXISTS: customers having at least one urgent order. */
  val q15 = GQuery(
    "q15_semi_join",
    (s, dir) => {
      val urgent = Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT")
      Tables.customer(s, dir)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, c_mktsegment FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))

  /** Left-anti join = NOT EXISTS: parts never shipped. */
  val q16 = GQuery(
    "q16_anti_join",
    (s, dir) =>
      Tables.part(s, dir)
        .join(Tables.lineitem(s, dir), col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_brand")
        .orderBy("p_partkey"),
    Some("""SELECT p_partkey, p_brand FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey"""))

  /** Analytic windows (lag / row_number / running sum). The running sum is
    * computed in frame order on both engines, so the double accumulation
    * order — and therefore the rounded value — is identical.
    */
  val q17 = GQuery(
    "q17_window_analytics",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          lag("o_orderkey", 1).over(w).as("prev_orderkey"),
          graft.functions.Metrics.canonRound(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_spend"))
        .orderBy("o_custkey", "rn")
    },
    Some("""SELECT o_custkey, o_orderkey,
      CAST(row_number() OVER w AS INTEGER) AS rn,
      lag(o_orderkey, 1) OVER w AS prev_orderkey,
      floor((sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 1e2 + 0.5)/1e2 AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      ORDER BY o_custkey, rn"""))

  /** Global top-n by an exact (integer) measure (A7): deterministic
    * tie-break on the key. TakeOrderedAndProject — no full sort at scale.
    */
  val q18 = GQuery(
    "q18_top_customers",
    (s, dir) =>
      Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("o_custkey").asc)
        .limit(10),
    Some("""SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
      ORDER BY n_orders DESC, o_custkey ASC LIMIT 10"""))

  /** TPC-H Q5-shaped 5-table star join: fact⋈fact shuffle on orderkey, all
    * dimension hops broadcast.
    */
  val q19 = GQuery(
    "q19_star_join",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(graft.functions.Metrics.canonRound(Metrics.exactSum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name", "n_name")
    },
    Some("""SELECT r_name, n_name,
      floor((CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS revenue,
      count(*) AS n_lines
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** Left outer join preserving unmatched dimension rows (zero-order
    * customers kept with n_orders = 0).
    */
  val q20 = GQuery(
    "q20_left_join_agg",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
        .orderBy("c_custkey")
    },
    Some("""SELECT c_custkey, CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders
      FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) o
      ON c_custkey = o_custkey ORDER BY c_custkey"""))

  /** Scalar "subquery": orders above 1.5× the global average price. Spark
    * shape is a 1-row broadcast cross join, the distributed equivalent of a
    * correlated-free scalar subquery.
    */
  val q21 = GQuery(
    "q21_scalar_subquery",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val avgPrice = o.agg(Metrics.exactMean(col("o_totalprice")).as("avg_price"))
      o.crossJoin(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(floor((o_totalprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*) FROM orders)
      ORDER BY o_orderkey"""))

  /** Pivot-style conditional aggregation (the reference's indicator-column
    * pattern, kaggle/kaggle.py:248-329): one pass, one output row per
    * status, one column per priority.
    */
  val q22 = GQuery(
    "q22_pivot_indicators",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      o.groupBy("o_orderstatus")
        .agg(
          sum((col("o_orderpriority") === "1-URGENT").cast("long")).as("n_urgent"),
          sum((col("o_orderpriority") === "2-HIGH").cast("long")).as("n_high"),
          sum((col("o_orderpriority") === "3-MEDIUM").cast("long")).as("n_medium"),
          sum((col("o_orderpriority") === "4-NOT SPECIFIED").cast("long")).as("n_notspec"),
          sum((col("o_orderpriority") === "5-LOW").cast("long")).as("n_low"))
        .orderBy("o_orderstatus")
    },
    Some("""SELECT o_orderstatus,
      CAST(sum(CASE WHEN o_orderpriority='1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
      CAST(sum(CASE WHEN o_orderpriority='2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
      CAST(sum(CASE WHEN o_orderpriority='3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS n_medium,
      CAST(sum(CASE WHEN o_orderpriority='4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS n_notspec,
      CAST(sum(CASE WHEN o_orderpriority='5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS n_low
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Multi-dimensional cube aggregation (free from Catalyst; the cube
    * sibling of q14's rollup). Grouping nulls labeled to dodge
    * null-ordering divergence.
    */
  val q23 = GQuery(
    "q23_cube",
    (s, dir) =>
      Tables.orders(s, dir)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"),
          graft.functions.Metrics.canonRound(Metrics.exactSum(col("o_totalprice")), 2).as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("total"))
        .orderBy("status", "priority"),
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      count(*) AS n,
      floor((CAST(sum(CAST(floor((o_totalprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS total
      FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      ORDER BY status, priority"""))

  /** Set difference (EXCEPT): customers active in 1995 but not 1996. */
  val q24 = GQuery(
    "q24_except",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.except(y96).orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
      EXCEPT
      SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
      ORDER BY o_custkey"""))

  /** Set intersection: customers active in both years. */
  val q25 = GQuery(
    "q25_intersect",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val y95 = o.filter(year(col("o_orderdate")) === 1995).select("o_custkey")
      val y96 = o.filter(year(col("o_orderdate")) === 1996).select("o_custkey")
      y95.intersect(y96).orderBy("o_custkey")
    },
    Some("""SELECT o_custkey FROM orders WHERE year(o_orderdate)=1995
      INTERSECT
      SELECT o_custkey FROM orders WHERE year(o_orderdate)=1996
      ORDER BY o_custkey"""))

  /** Correlated scalar subquery, decorrelated (TPC-H Q17 shape): lineitems
    * below 50% of their part's average quantity. Spark-first form: the
    * per-part aggregate IS the decorrelation — a join against a grouped
    * frame, which Catalyst would produce from the subquery anyway.
    */
  val q26 = GQuery(
    "q26_correlated_agg",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val perPart = l.groupBy(col("l_partkey").as("pk"))
        .agg(avg("l_quantity").as("avg_qty"))
      l.join(perPart, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_small"),
          graft.functions.Metrics.canonRound(Metrics.exactSum(col("l_extendedprice")), 2).as("value"))
        .orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, count(*) AS n_small,
      floor((CAST(sum(CAST(floor((l_extendedprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS value
      FROM lineitem l
      WHERE l_quantity < 0.5 * (SELECT avg(l_quantity) FROM lineitem WHERE l_partkey = l.l_partkey)
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Cardinality sketches (the 100 TB path for A6): HLL approx next to the
    * exact count. Sketch internals differ per engine → rows-only check.
    */
  val q27 = GQuery(
    "q27_approx_distinct",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("exact_parts"),
          approx_count_distinct("l_partkey", 0.02).as("approx_parts"))
        .orderBy("l_returnflag"),
    None)

  /** RANGE-framed rolling window: 7-day trailing revenue per returnflag.
    * The frame is value-based (days), not row-based — the frame kind q17
    * doesn't cover. All arithmetic stays DECIMAL inside the window so both
    * engines' sliding-aggregation algorithms (linear vs segment-tree) are
    * exact and order-free.
    */
  val q28 = GQuery(
    "q28_rolling_window",
    (s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), to_date(col("l_shipdate")).as("d"))
        .agg(sum(graft.functions.Metrics.canonRound(
          col("l_extendedprice") * (lit(1) - col("l_discount")), 4)
          .cast("decimal(18,4)")).as("rev"))
      val w = Window.partitionBy("l_returnflag")
        .orderBy(datediff(col("d"), lit("1995-01-01")))
        .rangeBetween(-6, 0)
      daily.select(col("l_returnflag"),
          col("d").cast("timestamp_ntz").as("day"),
          sum(col("rev")).over(w).cast("double").as("rev_7d"))
        .select(col("l_returnflag"), col("day"),
          graft.functions.Metrics.canonRound(col("rev_7d"), 2).as("rev_7d"))
        .orderBy("l_returnflag", "day")
    },
    Some("""WITH daily AS (
        SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d,
          sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS rev
        FROM lineitem GROUP BY 1, 2)
      SELECT l_returnflag, CAST(d AS TIMESTAMP) AS day,
        floor((CAST(sum(rev) OVER (PARTITION BY l_returnflag
            ORDER BY date_diff('day', DATE '1995-01-01', d)
            RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS rev_7d
      FROM daily ORDER BY l_returnflag, day"""))

  /** GROUPING SETS through the library's SQL surface (spark.sql over the
    * registered fixture views) — the agg shape between q14's rollup and
    * q23's cube, and proof the engine is usable as plain SQL.
    */
  val q29 = GQuery(
    "q29_grouping_sets",
    (s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
                      coalesce(o_orderpriority, 'ALL') AS priority,
                      count(*) AS n
               FROM orders
               GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
               ORDER BY status, priority""")
    },
    Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
      coalesce(o_orderpriority, 'ALL') AS priority,
      count(*) AS n
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY status, priority"""))

  /** TPC-H Q14 shape: promo revenue share per month — conditional
    * aggregation as a ratio over a fact⋈dim join with a string-prefix
    * predicate. Both numerator and denominator accumulate as exact
    * decimals, so the final double division is bit-identical cross-engine.
    */
  val q57 = GQuery(
    "q57_promo_ratio",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val rev = graft.functions.Metrics.canonRound(
        col("l_extendedprice") * (lit(1) - col("l_discount")), 4).cast("decimal(18,4)")
      l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .groupBy(date_trunc("month", col("l_shipdate")).cast("timestamp_ntz").as("month"))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0).cast("decimal(18,4)")))
            .as("promo_rev"),
          sum(rev).as("total_rev"))
        .select(col("month"),
          graft.functions.Metrics.canonRound(
            lit(100.0) * col("promo_rev").cast("double") / col("total_rev").cast("double"), 4)
            .as("promo_pct"))
        .orderBy("month")
    },
    Some("""SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
      floor((100.0
        * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                        THEN CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        / CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE))
        * 1e4 + 0.5)/1e4 AS promo_pct
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1 ORDER BY month"""))

  /** TPC-H Q2-shaped correlated-min subquery: for each small part, the
    * EUROPE supplier(s) with the minimum observed unit price. The
    * correlation ("min cost for THIS part") decorrelates to a per-part
    * window min — the same rewrite Catalyst's subquery decorrelation
    * performs; supplier→nation→region is a broadcast snowflake.
    */
  val q58 = GQuery(
    "q58_min_cost_supplier",
    (s, dir) => {
      val supEu = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name")
      val costs = Tables.lineitem(s, dir)
        .join(broadcast(supEu), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"), col("s_name"))
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_cost"))
      val w = Window.partitionBy("l_partkey")
      val best = costs.withColumn("min_cost", min("unit_cost").over(w))
        .filter(col("unit_cost") === col("min_cost"))
      best.join(broadcast(Tables.part(s, dir).filter(col("p_size") <= 5)),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("s_name"),
          Metrics.canonRound(col("unit_cost"), 4).as("best_cost"))
        .orderBy("p_partkey", "s_name")
    },
    Some("""WITH costs AS (
        SELECT l_partkey, l_suppkey, s_name,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY 1, 2, 3)
      SELECT p_partkey, s_name, floor((unit_cost) * 1e4 + 0.5)/1e4 AS best_cost
      FROM costs c JOIN part ON c.l_partkey = p_partkey
      WHERE p_size <= 5
        AND unit_cost = (SELECT min(c2.unit_cost) FROM costs c2
                         WHERE c2.l_partkey = c.l_partkey)
      ORDER BY p_partkey, s_name"""))

  /** TPC-H Q11-shaped scalar-subquery HAVING: parts whose revenue exceeds a
    * fraction of TOTAL revenue. The scalar aggregate is one broadcast row
    * (crossJoin) — no second scan ordering dependence because both sums use
    * the decimal-snapped accumulation (Metrics.exactSum).
    */
  val q59 = GQuery(
    "q59_part_value_share",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val perPart = l.groupBy("l_partkey").agg(Metrics.exactSum(rev).as("value"))
      val total = l.agg(Metrics.exactSum(rev).as("total"))
      perPart.crossJoin(broadcast(total))
        .filter(col("value") > col("total") * 0.0005)
        .select(col("l_partkey"), Metrics.canonRound(col("value"), 2).as("part_value"))
        .orderBy("l_partkey")
    },
    Some("""WITH pv AS (
        SELECT l_partkey,
          CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE) AS value
        FROM lineitem GROUP BY 1),
      t AS (
        SELECT CAST(sum(CAST(floor((l_extendedprice*(1-l_discount)) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM lineitem)
      SELECT l_partkey, floor((value) * 1e2 + 0.5)/1e2 AS part_value
      FROM pv, t WHERE value > total * 0.0005
      ORDER BY l_partkey"""))

  /** TPC-H Q20-shaped nested-IN semi-join: suppliers where some part's
    * recent shipments (1999+) exceed half that part's all-time shipped
    * quantity. Nested agg + HAVING + IN collapses to groupBy + filter +
    * left-semi join; quantities are integral doubles so the sums are exact.
    */
  val q65 = GQuery(
    "q65_half_shipped_supplier",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val qual = l.groupBy("l_suppkey", "l_partkey")
        .agg(sum(when(to_date(col("l_shipdate")) >= lit("1999-01-01"), col("l_quantity"))
          .otherwise(lit(0.0))).as("recent_qty"),
          sum("l_quantity").as("total_qty"))
        .filter(col("recent_qty") > col("total_qty") * 0.5)
        .select("l_suppkey").distinct()
      Tables.supplier(s, dir)
        .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"),
          Metrics.canonRound(col("s_acctbal"), 2).as("acctbal"))
        .orderBy("s_suppkey")
    },
    Some("""SELECT s_suppkey, s_name, floor((s_acctbal) * 1e2 + 0.5)/1e2 AS acctbal
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        GROUP BY l_suppkey, l_partkey
        HAVING sum(CASE WHEN CAST(l_shipdate AS DATE) >= DATE '1999-01-01'
                        THEN l_quantity ELSE 0 END) > 0.5 * sum(l_quantity))
      ORDER BY s_suppkey"""))

  /** Exact multi-quantile aggregation (A4 beyond the median): 25/50/75th
    * percentiles per group in one pass. The 100 TB path swaps `percentile`
    * for `percentile_approx` (single-pass sketch, same call shape); exact
    * is kept here because the oracle interpolation must match bitwise.
    */
  val q69 = GQuery(
    "q69_quantiles",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75))").as("q"))
        .select(col("l_returnflag"),
          Metrics.canonRound(element_at(col("q"), 1), 4).as("q25"),
          Metrics.canonRound(element_at(col("q"), 2), 4).as("q50"),
          Metrics.canonRound(element_at(col("q"), 3), 4).as("q75"))
        .orderBy("l_returnflag"),
    Some("""SELECT l_returnflag,
        floor((quantile_cont(l_extendedprice, 0.25)) * 1e4 + 0.5)/1e4 AS q25,
        floor((quantile_cont(l_extendedprice, 0.50)) * 1e4 + 0.5)/1e4 AS q50,
        floor((quantile_cont(l_extendedprice, 0.75)) * 1e4 + 0.5)/1e4 AS q75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Top-k per group via the bounded-heap Aggregator (functions.TopK) —
    * the scale path for q08's shape: partial aggregation keeps ≤ k rows
    * per group map-side, so the shuffle carries k×groups×partitions rows
    * instead of the whole fact table (the window idiom sorts everything).
    * posexplode of the finished buffer restores per-rank rows; the oracle
    * is the equivalent ranking window.
    */
  val q79 = GQuery(
    "q79_topk_agg",
    (s, dir) => {
      val topk = graft.functions.TopK.topK(5)
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(topk(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
          .as("top"))
        .select(col("l_returnflag"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("l_returnflag"),
          (col("pos") + 1).cast("int").as("rank"),
          Metrics.canonRound(col("r.value"), 2).as("price"),
          col("r.key1").as("orderkey"), col("r.key2").as("linenumber"))
        .orderBy("l_returnflag", "rank")
    },
    Some("""SELECT l_returnflag, CAST(rank AS INTEGER) AS rank,
        floor((price) * 1e2 + 0.5)/1e2 AS price, orderkey, linenumber
      FROM (
        SELECT l_returnflag, l_extendedprice AS price,
               l_orderkey AS orderkey, l_linenumber AS linenumber,
               row_number() OVER (PARTITION BY l_returnflag
                 ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rank
        FROM lineitem) t
      WHERE rank <= 5 ORDER BY l_returnflag, rank"""))

  /** Full ranking-function suite (rank / dense_rank / percent_rank /
    * cume_dist / ntile / lead / nth_value) — the analytic functions q17
    * doesn't cover. Order within each partition is made total by the
    * unique o_orderkey tie-break, so every function is deterministic on
    * both engines (and RANGE vs ROWS default frames coincide).
    *
    * Scale note: partitionBy on a 5-value key means at most 5-way
    * parallelism for the sort — fine here because the measure is a
    * per-priority ranking by construction. A scale-up of this shape with
    * millions of rows per priority would move to the q79 bounded-heap
    * aggregator (for top-k) or a range-partitioned two-phase rank; the
    * full-rank output itself is inherently one sorted pass per group.
    */
  val q84 = GQuery(
    "q84_rank_suite",
    (s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          Metrics.canonRound(percent_rank().over(w), 6).as("prank"),
          Metrics.canonRound(cume_dist().over(w), 6).as("cdist"),
          ntile(4).over(w).as("quartile"),
          lead("o_orderkey", 1).over(w).as("next_orderkey"),
          nth_value(col("o_orderkey"), 3).over(w).as("third_orderkey"))
        .orderBy("o_orderpriority", "rnk")
    },
    Some("""SELECT o_orderkey, o_orderpriority,
      CAST(rank() OVER w AS INTEGER) AS rnk,
      CAST(dense_rank() OVER w AS INTEGER) AS drnk,
      floor((percent_rank() OVER w) * 1e6 + 0.5)/1e6 AS prank,
      floor((cume_dist() OVER w) * 1e6 + 0.5)/1e6 AS cdist,
      CAST(ntile(4) OVER w AS INTEGER) AS quartile,
      lead(o_orderkey, 1) OVER w AS next_orderkey,
      nth_value(o_orderkey, 3) OVER w AS third_orderkey
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderpriority, rnk"""))

  /** Fixed-width histogram + cumulative distribution: portable binning
    * (floor division — no engine-specific width_bucket) with a running
    * share over the tiny bin table. The heavy groupBy is map-side
    * combined to ≤ nbins rows × partitions; the window only ever sees
    * the bins.
    */
  val q89 = GQuery(
    "q89_histogram",
    (s, dir) => {
      val binW = 25000.0
      val w = Window.orderBy("bin")
      val bins = Tables.orders(s, dir)
        .select(least(floor(col("o_totalprice") / binW), lit(19.0)).cast("int").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
      val total = bins.agg(sum("n").as("total"))
      bins.crossJoin(broadcast(total))
        .withColumn("cum_share",
          Metrics.canonRound(
            sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)) / col("total"), 6))
        .select(col("bin"), col("n"), col("cum_share"))
        .orderBy("bin")
    },
    Some("""WITH b AS (
        SELECT CAST(least(floor(o_totalprice / 25000.0), 19.0) AS INTEGER) AS bin,
               count(*) AS n
        FROM orders GROUP BY 1)
      SELECT bin, n,
        floor((CAST(sum(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               / (SELECT sum(n) FROM b)) * 1e6 + 0.5)/1e6 AS cum_share
      FROM b ORDER BY bin"""))

  /** RFM behavioral features per customer — recency (days since last
    * order, anchored to the corpus max date), frequency (order count),
    * monetary (exact sum), plus an ntile segment per dimension: the
    * classic churn/value feature block, one map-side-combined groupBy +
    * three rankings over the per-customer aggregate.
    *
    * Scale note: each segment ntile routes through
    * `DistributedRank.ntile` (range repartition + partition-local rank +
    * broadcast offsets — see its scaladoc), so even hundreds of millions
    * of customers never funnel through a single-task sort; the segment
    * boundaries stay EXACT (oracle-checked), where the usual
    * percentile_approx + CASE alternative would be approximate.
    */
  val q95 = GQuery(
    "q95_rfm_features",
    (s, dir) => {
      val anchor = Tables.orders(s, dir).agg(max(to_date(col("o_orderdate"))).as("anchor"))
      val rfm = Tables.orders(s, dir)
        .groupBy("o_custkey")
        .agg(max(to_date(col("o_orderdate"))).as("last_order"),
          count(lit(1)).as("frequency"),
          Metrics.canonRound(Metrics.exactSum(col("o_totalprice")), 2).as("monetary"))
        .crossJoin(broadcast(anchor))
        .withColumn("recency_days", datediff(col("anchor"), col("last_order")).cast("int"))
      def seg(df: org.apache.spark.sql.DataFrame, c: String, asc: Boolean, out: String) =
        DistributedRank.ntile(df,
          Seq(if (asc) col(c).asc else col(c).desc, col("o_custkey")), 4, out)
      seg(seg(seg(rfm, "recency_days", asc = true, "r_seg"),
          "frequency", asc = false, "f_seg"),
          "monetary", asc = false, "m_seg")
        .select(col("o_custkey"), col("recency_days"), col("frequency"), col("monetary"),
          col("r_seg"), col("f_seg"), col("m_seg"))
        .orderBy("o_custkey")
    },
    Some("""WITH anchor AS (SELECT max(CAST(o_orderdate AS DATE)) AS a FROM orders),
      rfm AS (
        SELECT o_custkey,
          CAST(date_diff('day', max(CAST(o_orderdate AS DATE)), (SELECT a FROM anchor)) AS INTEGER) AS recency_days,
          count(*) AS frequency,
          floor((CAST(sum(CAST(floor((o_totalprice) * 1e4 + 0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)) * 1e2 + 0.5)/1e2 AS monetary
        FROM orders GROUP BY o_custkey)
      SELECT o_custkey, recency_days, frequency, monetary,
        CAST(ntile(4) OVER (ORDER BY recency_days ASC, o_custkey) AS INTEGER) AS r_seg,
        CAST(ntile(4) OVER (ORDER BY frequency DESC, o_custkey) AS INTEGER) AS f_seg,
        CAST(ntile(4) OVER (ORDER BY monetary DESC, o_custkey) AS INTEGER) AS m_seg
      FROM rfm ORDER BY o_custkey"""))

  /** IQR-fence outlier detection per group: exact quartiles (q69's
    * operator) → broadcast fence lookup → one fact-scan filter. Fences
    * are rounded to the canonical grid on both engines before comparing
    * so a boundary row cannot flip on interpolation ulps. The 0.5·IQR
    * multiplier (vs the textbook 1.5) is a fixture artifact — the
    * synthetic prices are near-uniform and HAVE no 1.5·IQR tail; the
    * operator shape is identical. Scale: the quartile aggregate is per
    * group (tiny), the scan is one pass; at 100 TB swap percentile for
    * percentile_approx — same call shape (A4).
    */
  val q96 = GQuery(
    "q96_iqr_outliers",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      val q = l.groupBy("l_returnflag").agg(
        Metrics.canonRound(expr("percentile(l_extendedprice, 0.25)"), 4).as("q1"),
        Metrics.canonRound(expr("percentile(l_extendedprice, 0.75)"), 4).as("q3"))
        .withColumn("lo", Metrics.canonRound(col("q1") - (col("q3") - col("q1")) * 0.5, 4))
        .withColumn("hi", Metrics.canonRound(col("q3") + (col("q3") - col("q1")) * 0.5, 4))
      l.join(broadcast(q), "l_returnflag")
        .filter(col("l_extendedprice") < col("lo") || col("l_extendedprice") > col("hi"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          Metrics.canonRound(col("l_extendedprice"), 2).as("price"),
          (col("l_extendedprice") > col("hi")).as("is_high"))
        // sort EVERY output column: (l_orderkey, l_linenumber) is not
        // unique in the fixtures (the q02 trap), and rows tied on the
        // rounded price but differing in l_returnflag/is_high are not
        // interchangeable under the hash gate (review finding, r14)
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "price", "is_high")
    },
    Some("""WITH q AS (
        SELECT l_returnflag,
          floor((quantile_cont(l_extendedprice, 0.25)) * 1e4 + 0.5)/1e4 AS q1,
          floor((quantile_cont(l_extendedprice, 0.75)) * 1e4 + 0.5)/1e4 AS q3
        FROM lineitem GROUP BY 1),
      f AS (
        SELECT l_returnflag,
          floor((q1 - (q3 - q1) * 0.5) * 1e4 + 0.5)/1e4 AS lo,
          floor((q3 + (q3 - q1) * 0.5) * 1e4 + 0.5)/1e4 AS hi
        FROM q)
      SELECT l_orderkey, l_linenumber, l.l_returnflag,
        floor((l_extendedprice) * 1e2 + 0.5)/1e2 AS price,
        l_extendedprice > hi AS is_high
      FROM lineitem l JOIN f ON l.l_returnflag = f.l_returnflag
      WHERE l_extendedprice < lo OR l_extendedprice > hi
      ORDER BY l_orderkey, l_linenumber, l.l_returnflag, price, is_high"""))

  /** Mergeable-sketch rollup: per-month HLL sketches of distinct
    * customers, UNIONED to per-year estimates — the pattern that makes
    * distinct-count rollups feasible at 100 TB (sketches re-aggregate
    * across grains; exact distincts don't — a yearly exact count must
    * re-scan, it cannot reuse monthly results). DataSketches HLL via
    * hll_sketch_agg / hll_union_agg / hll_sketch_estimate; the estimate
    * is order-independent (max-per-bucket), so output is deterministic.
    * The exact yearly count rides along as the audit column (q27's
    * pattern); no DuckDB oracle — different sketch implementation.
    */
  val q98 = GQuery(
    "q98_sketch_rollup",
    (s, dir) => {
      val o = Tables.orders(s, dir)
        .withColumn("y", year(col("o_orderdate")))
        .withColumn("m", month(col("o_orderdate")))
      val monthly = o.groupBy("y", "m")
        .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
      val yearly = monthly.groupBy("y")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est_customers"))
      val exact = o.groupBy("y").agg(countDistinct("o_custkey").as("exact_customers"))
      yearly.join(exact, "y")
        .select(col("y").cast("int").as("y"), col("est_customers"), col("exact_customers"))
        .orderBy("y")
    },
    None)

  /** Salted skew join, oracle-proved semantics-preserving: the salt is
    * internal plumbing (big side scatters each key across `salt` buckets,
    * small side replicates salt×), so the join RESULT must equal the
    * plain equi join — which is exactly what the DuckDB oracle computes.
    * This promotes operators.SkewJoin from spec-only into the hash gate.
    *
    * Scale: explicit salting is the deterministic fallback when one key
    * owns a pathological share of the big side and AQE's runtime skew
    * split can't help (e.g. a single-key broadcast-miss); the aggregate
    * on top is map-side combinable either way.
    */
  val q115 = GQuery(
    "q115_salted_join",
    (s, dir) => {
      val li = Tables.lineitem(s, dir).select(col("l_partkey"), col("l_quantity"))
      val pt = Tables.part(s, dir).filter(col("p_size") <= 10)
        .select(col("p_partkey").as("l_partkey"), col("p_brand"))
      SkewJoin.saltedJoin(li, pt, "l_partkey", salt = 8)
        .groupBy("p_brand")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy("p_brand")
    },
    Some("""SELECT p_brand, sum(l_quantity) AS sum_qty, count(*) AS n_rows
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size <= 10
      GROUP BY p_brand ORDER BY p_brand"""))

  /** MERGE INTO / upsert as a full-outer join: the target is each
    * customer's state as of the cutover date (latest order), the source
    * is the post-cutover slice; the merge tags every key insert / update
    * / keep and emits the new dimension state in one pass — the
    * DataFrame-native MERGE shape (no per-row mutation loop).
    *
    * Scale: two window passes (one per slice, each a single shuffle on
    * the key) + one full-outer shuffle join on the same key — AQE reuses
    * the co-partitioning. No driver-side diffing.
    */
  val q116 = GQuery(
    "q116_merge_upsert",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      def latest(df: DataFrame) = df
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("o_custkey"),
          col("o_orderdate").cast("timestamp_ntz").as("state_date"),
          col("o_totalprice").as("state_price"))
      val orders = Tables.orders(s, dir)
      val target = latest(orders.filter(col("o_orderdate") < lit("2000-01-01")))
        .withColumnRenamed("state_date", "t_date").withColumnRenamed("state_price", "t_price")
      val source = latest(orders.filter(col("o_orderdate") >= lit("2000-01-01")))
        .withColumnRenamed("state_date", "s_date").withColumnRenamed("state_price", "s_price")
      target.join(source, Seq("o_custkey"), "full_outer")
        .select(col("o_custkey"),
          when(col("s_date").isNull, lit("keep"))
            .when(col("t_date").isNull, lit("insert"))
            .otherwise(lit("update")).as("action"),
          coalesce(col("s_date"), col("t_date")).as("state_date"),
          coalesce(col("s_price"), col("t_price")).as("state_price"))
        .orderBy("o_custkey")
    },
    Some("""WITH latest_t AS (
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS t_date, o_totalprice AS t_price,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate < DATE '2000-01-01'),
      latest_s AS (
        SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS s_date, o_totalprice AS s_price,
               row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate >= DATE '2000-01-01')
      SELECT coalesce(t.o_custkey, s.o_custkey) AS o_custkey,
        CASE WHEN s.s_date IS NULL THEN 'keep'
             WHEN t.t_date IS NULL THEN 'insert'
             ELSE 'update' END AS action,
        coalesce(s.s_date, t.t_date) AS state_date,
        coalesce(s.s_price, t.t_price) AS state_price
      FROM (SELECT * FROM latest_t WHERE rn = 1) t
      FULL OUTER JOIN (SELECT * FROM latest_s WHERE rn = 1) s ON t.o_custkey = s.o_custkey
      ORDER BY o_custkey"""))

  /** Mergeable quantile sketch (operators.HistogramQuantile): per-flag
    * p50/p90/p99 of l_extendedprice from a 256-bin equi-width histogram
    * CDF, with the exact percentile and the estimation error alongside —
    * the deterministic, re-aggregable stand-in for percentile_approx
    * that completes the sketch family (HLL q27/q98, Bloom q86, CMS
    * q124). Bin counts merge by addition (the q98 rollup property).
    */
  val q139 = GQuery(
    "q139_histogram_quantile",
    (s, dir) => HistogramQuantile.quantiles(
      Tables.lineitem(s, dir), "l_returnflag", "l_extendedprice",
      nBins = 256, ps = Seq(0.5, 0.9, 0.99)),
    Some(HistogramQuantile.oracleSql(
      "lineitem", "l_returnflag", "l_extendedprice",
      nBins = 256, ps = Seq(0.5, 0.9, 0.99))))

  /** 2-D skyline (Pareto frontier, Börzsönyi 2001): the parts no other
    * part strictly dominates on (maximize p_size, minimize
    * p_retailprice). The sort-scan algorithm, not the quadratic
    * dominance anti-join: per-size min prices, then a running min over
    * strictly-larger sizes — a part survives iff it holds its size's min
    * price AND beats every larger size's best price. O(n) after one
    * per-size agg; the window runs over |distinct sizes| rows, never the
    * part corpus. Only comparisons touch the doubles — no float
    * arithmetic to canonicalize.
    */
  def skylineParts(part: DataFrame): DataFrame = {
    val perSize = part.groupBy("p_size").agg(min("p_retailprice").as("min_price"))
    val w = Window.orderBy(col("p_size").desc).rowsBetween(Window.unboundedPreceding, -1)
    val frontierSizes = perSize
      .withColumn("best_larger", min("min_price").over(w))
      .filter(col("best_larger").isNull || col("min_price") < col("best_larger"))
      .select(col("p_size"), col("min_price"))
    part.join(broadcast(frontierSizes), Seq("p_size"))
      .filter(col("p_retailprice") === col("min_price"))
      .select(col("p_partkey"), col("p_name"), col("p_size"), col("p_retailprice"))
      .orderBy("p_partkey")
  }

  val q153 = GQuery(
    "q153_skyline_parts",
    (s, dir) => skylineParts(Tables.part(s, dir)),
    Some("""WITH persize AS (
        SELECT p_size, min(p_retailprice) AS min_price FROM part GROUP BY p_size),
      fr AS (
        SELECT p_size, min_price,
          min(min_price) OVER (ORDER BY p_size DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_larger
        FROM persize),
      fsz AS (
        SELECT p_size, min_price FROM fr
        WHERE best_larger IS NULL OR min_price < best_larger)
      SELECT p.p_partkey, p.p_name, p.p_size, p.p_retailprice
      FROM part p JOIN fsz f ON f.p_size = p.p_size AND p.p_retailprice = f.min_price
      ORDER BY p.p_partkey"""))

  /** Snapshot diff / CDC changelog: given two versions of a dimension,
    * emit the changelog (added / removed / changed rows with before and
    * after values) — the generator behind incremental downstream refresh
    * and audit trails, and the inverse of q116's MERGE. Snapshots are
    * carved deterministically from `customer`: the old snapshot is
    * missing every 11th key (rows "inserted later") and carries +100 on
    * every 7th balance (rows "edited since"); the new one is missing
    * every 13th key (rows "deleted since").
    *
    * Distributed shape: ONE full outer join on the key — no driver
    * diffing; equality tests touch the doubles only through exact +100
    * arithmetic, so no canonicalization is needed.
    */
  def snapshotDiff(old: DataFrame, neu: DataFrame): DataFrame = {
    val o = old.select(col("c_custkey").as("k_old"), col("c_acctbal").as("bal_old"))
    val n = neu.select(col("c_custkey").as("k_new"), col("c_acctbal").as("bal_new"))
    o.join(n, col("k_old") === col("k_new"), "full_outer")
      .select(coalesce(col("k_old"), col("k_new")).as("c_custkey"),
        when(col("k_old").isNull, "added")
          .when(col("k_new").isNull, "removed")
          .when(col("bal_old") =!= col("bal_new"), "changed")
          .otherwise("unchanged").as("status"),
        col("bal_old"), col("bal_new"))
      .filter(col("status") =!= "unchanged")
      .orderBy("c_custkey")
  }

  val q159 = GQuery(
    "q159_snapshot_diff",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val old = c.filter(col("c_custkey") % 11 =!= 0)
        .withColumn("c_acctbal",
          col("c_acctbal") + when(col("c_custkey") % 7 === 0, 100.0).otherwise(0.0))
      val neu = c.filter(col("c_custkey") % 13 =!= 0)
      snapshotDiff(old, neu)
    },
    Some("""WITH old AS (
        SELECT c_custkey AS k_old,
          c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END AS bal_old
        FROM customer WHERE c_custkey % 11 <> 0),
      neu AS (
        SELECT c_custkey AS k_new, c_acctbal AS bal_new
        FROM customer WHERE c_custkey % 13 <> 0),
      d AS (
        SELECT coalesce(k_old, k_new) AS c_custkey,
          CASE WHEN k_old IS NULL THEN 'added'
               WHEN k_new IS NULL THEN 'removed'
               WHEN bal_old <> bal_new THEN 'changed'
               ELSE 'unchanged' END AS status,
          bal_old, bal_new
        FROM old FULL OUTER JOIN neu ON k_old = k_new)
      SELECT c_custkey, status, bal_old, bal_new FROM d
      WHERE status <> 'unchanged' ORDER BY c_custkey"""))

  /** Referential- and domain-integrity audit, the data-quality gate a
    * warehouse runs after every load: three FK constraints (lineitem →
    * orders, orders → customer, events → customer) plus one value-domain
    * constraint (documents.lang ∈ the supported-language set). Per
    * constraint: child rows, violating rows, distinct violating keys.
    * The fixture's FKs are clean — the zeros are the PROOF — while the
    * lang domain genuinely violates, exercising the non-zero path.
    *
    * Distributed shape: each constraint is one left join of the child
    * onto the deduped parent KEY SET (a key-only frame — broadcast when
    * small, shuffle semi-join otherwise; never the parent's payload) +
    * one count agg; constraints union into the report.
    */
  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    def check(name: String, child: DataFrame, key: String, parentKeys: DataFrame): DataFrame = {
      val pk = parentKeys.distinct().withColumn("__ok", lit(1))
      child.select(col(key)).join(pk, Seq(key), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("__ok").isNull.cast("long")).as("n_bad"),
          countDistinct(when(col("__ok").isNull, col(key))).as("n_bad_keys"))
        .select(lit(name).as("constraint_name"), col("n_rows"), col("n_bad"), col("n_bad_keys"))
    }
    import spark.implicits._
    val langDim = Seq("en", "fr", "de", "es").toDF("lang") // tiny literal dim
    check("fk_events_customer", Tables.events(spark, dir).select(col("user_id").cast("long").as("k")),
        "k", Tables.customer(spark, dir).select(col("c_custkey").cast("long").as("k")))
      .unionByName(check("fk_lineitem_orders", Tables.lineitem(spark, dir).select(col("l_orderkey").as("k")),
        "k", Tables.orders(spark, dir).select(col("o_orderkey").as("k"))))
      .unionByName(check("fk_orders_customer", Tables.orders(spark, dir).select(col("o_custkey").as("k")),
        "k", Tables.customer(spark, dir).select(col("c_custkey").as("k"))))
      .unionByName(check("dom_documents_lang", Tables.documents(spark, dir).select(col("lang")),
        "lang", langDim))
      .orderBy("constraint_name")
  }

  val q160 = GQuery(
    "q160_integrity_audit",
    (s, dir) => integrityAudit(s, dir),
    Some("""WITH checks AS (
      SELECT 'fk_events_customer' AS constraint_name,
        count(*) AS n_rows,
        CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        count(DISTINCT CASE WHEN c.c_custkey IS NULL THEN e.user_id END) AS n_bad_keys
      FROM events e LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON e.user_id = c.c_custkey
      UNION ALL
      SELECT 'fk_lineitem_orders', count(*),
        CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        count(DISTINCT CASE WHEN o.o_orderkey IS NULL THEN l.l_orderkey END)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'fk_orders_customer', count(*),
        CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        count(DISTINCT CASE WHEN c.c_custkey IS NULL THEN o.o_custkey END)
      FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'dom_documents_lang', count(*),
        -- NULL-strict on purpose: the Spark side LEFT JOINs onto the
        -- domain dim, so a NULL lang never matches and counts as a
        -- violation; a bare NOT IN would evaluate to NULL here and
        -- silently count it clean
        CAST(sum(CASE WHEN d.lang IS NULL OR d.lang NOT IN ('en','fr','de','es') THEN 1 ELSE 0 END) AS BIGINT),
        count(DISTINCT CASE WHEN d.lang IS NULL OR d.lang NOT IN ('en','fr','de','es') THEN d.lang END)
      FROM documents d)
      SELECT * FROM checks ORDER BY constraint_name"""))

  /** Merkle-style range digests: the table-sync primitive behind
    * anti-entropy reconciliation of two copies of a 100 TB table —
    * instead of shipping rows, each side ships one md5 per 1024-key
    * range; only ranges whose digests differ get row-level diffing
    * (q159's changelog). Row canonicalization goes through the q130
    * min/max precedent (canonRound → DECIMAL → string) so the digest is
    * engine- and layout-independent; within a range, row hashes sort
    * lexically before concatenation, so partition order can't leak in.
    *
    * Scale: one scan computing row hashes + one (bucket) agg; the
    * sort_array runs over ≤1024 row hashes per bucket — bounded, never
    * a global sort.
    */
  def merkleRangeDigests(orders: DataFrame): DataFrame = {
    val priceStr = Metrics.canonRound(col("o_totalprice"), 2)
      .cast("decimal(18,2)").cast("string")
    val rowHash = md5(concat_ws("|",
      col("o_orderkey").cast("string"), col("o_custkey").cast("string"),
      col("o_orderstatus"), priceStr, to_date(col("o_orderdate")).cast("string")))
    orders.select((floor(col("o_orderkey") / 1024L)).cast("long").as("bucket"),
        rowHash.as("rh"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        md5(concat_ws("", array_sort(collect_list(col("rh"))))).as("digest"))
      .orderBy("bucket")
  }

  val q164 = GQuery(
    "q164_merkle_digests",
    (s, dir) => merkleRangeDigests(Tables.orders(s, dir)),
    Some("""WITH r AS (
        SELECT CAST(floor(o_orderkey / 1024.0) AS BIGINT) AS bucket,
          md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' ||
              o_orderstatus || '|' ||
              CAST(CAST(floor(o_totalprice*1e2 + 0.5)/1e2 AS DECIMAL(18,2)) AS VARCHAR) || '|' ||
              CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS rh
        FROM orders)
      SELECT bucket, count(*) AS n_rows,
        md5(string_agg(rh, '' ORDER BY rh)) AS digest
      FROM r GROUP BY bucket ORDER BY bucket"""))

  /** Association-rule mining over per-user event baskets (Agrawal &
    * Srikant 1994's support/confidence framework, pair rules): basket =
    * the DISTINCT event types a user ever fired; for every ordered pair
    * A→B with pair support ≥ 5%, report support, confidence and lift —
    * the co-behavior screen ("users who error also churn?") run before
    * anything heavier than pairs is worth mining.
    *
    * Scale: one (user, type) distinct agg, then a per-user self-join of
    * baskets bounded by |types| per user (≤5 here — never a corpus
    * cross), finishing in a |types|²-sized rule frame. All counts are
    * integers; the three ratios land on the 1e-6 grid.
    */
  def associationRules(events: DataFrame, minSupport: Double): DataFrame = {
    val baskets = events.select(col("user_id"), col("event_type")).distinct()
    val nUsers = baskets.select("user_id").distinct().count() // tiny driver scalar
    val item = baskets.groupBy("event_type").agg(count(lit(1)).as("c_item"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"), col("a.user_id") === col("b.user_id")
        && col("a.event_type") =!= col("b.event_type"))
      .groupBy(col("a.event_type").as("lhs"), col("b.event_type").as("rhs"))
      .agg(count(lit(1)).as("c_pair"))
    val supp = col("c_pair").cast("double") / lit(nUsers.toDouble)
    val conf = col("c_pair").cast("double") / col("c_lhs").cast("double")
    val lift = conf * lit(nUsers.toDouble) / col("c_rhs").cast("double")
    pairs
      .join(broadcast(item.select(col("event_type").as("lhs"), col("c_item").as("c_lhs"))), "lhs")
      .join(broadcast(item.select(col("event_type").as("rhs"), col("c_item").as("c_rhs"))), "rhs")
      .filter(supp >= minSupport)
      .select(col("lhs"), col("rhs"), col("c_pair"),
        Metrics.canonRound(supp, 6).as("support"),
        Metrics.canonRound(conf, 6).as("confidence"),
        Metrics.canonRound(lift, 6).as("lift"))
      .orderBy("lhs", "rhs")
  }

  val q165 = GQuery(
    "q165_association_rules",
    (s, dir) => associationRules(Tables.events(s, dir), minSupport = 0.05),
    Some("""WITH baskets AS (
        SELECT DISTINCT user_id, event_type FROM events),
      nu AS (SELECT count(DISTINCT user_id) AS n FROM baskets),
      item AS (SELECT event_type, count(*) AS c_item FROM baskets GROUP BY event_type),
      pairs AS (
        SELECT a.event_type AS lhs, b.event_type AS rhs, count(*) AS c_pair
        FROM baskets a JOIN baskets b
          ON a.user_id = b.user_id AND a.event_type <> b.event_type
        GROUP BY 1, 2)
      SELECT p.lhs, p.rhs, p.c_pair,
        floor(CAST(p.c_pair AS DOUBLE)/CAST(nu.n AS DOUBLE)*1e6 + 0.5)/1e6 AS support,
        floor(CAST(p.c_pair AS DOUBLE)/CAST(la.c_item AS DOUBLE)*1e6 + 0.5)/1e6 AS confidence,
        floor(CAST(p.c_pair AS DOUBLE)/CAST(la.c_item AS DOUBLE)*CAST(nu.n AS DOUBLE)/CAST(lb.c_item AS DOUBLE)*1e6 + 0.5)/1e6 AS lift
      FROM pairs p
      JOIN item la ON la.event_type = p.lhs
      JOIN item lb ON lb.event_type = p.rhs
      CROSS JOIN nu
      WHERE CAST(p.c_pair AS DOUBLE)/CAST(nu.n AS DOUBLE) >= 0.05
      ORDER BY lhs, rhs"""))

  /** Item-item collaborative filtering on co-purchase baskets (Sarwar
    * 2001 / the Amazon item-to-item shape): basket = an order's distinct
    * parts, item-item cosine = co-occurrence / √(n_i)·√(n_j), top-3
    * neighbors per part — the "customers who bought X also bought"
    * recommender built from counts alone.
    *
    * Scale: pairs are generated PER ORDER (a double explode of the
    * order's item set), so candidates are Σ_orders basket² — never
    * |items|² — and `maxBasket` caps basket² for pathological orders
    * (the deterministic skew guard: keep the `maxBasket` smallest
    * partkeys; at 100 TB one 10k-line order would otherwise emit 10⁸
    * pairs). One shuffle builds the baskets; the pair stream goes
    * straight to the (item, neighbor) count — no basket self-join
    * re-shuffle. `minCo` is the usual CF support floor: a pair seen in
    * one order is noise, and dropping it before the per-item ranking
    * window cuts the ranked frame by ~10× at fixture scale. Norms are
    * integer counts; the cosine is one IEEE quotient ranked after a
    * 1e-6 snap with the neighbor key as tie-break.
    */
  def itemItemCf(lineitem: DataFrame, topK: Int,
                 maxBasket: Int = Int.MaxValue, minCo: Long = 1L): DataFrame = {
    val baskets = lineitem.groupBy(col("l_orderkey").as("ok"))
      .agg(slice(array_sort(collect_set(col("l_partkey"))), 1, maxBasket).as("items"))
    val b = baskets.select(explode(col("items")).as("item"))
    val n = b.groupBy("item").agg(count(lit(1)).as("n_ord"))
    val co = baskets.select(explode(col("items")).as("item"), col("items"))
      .select(col("item"), explode(col("items")).as("neighbor"))
      .filter(col("item") =!= col("neighbor"))
      .groupBy(col("item"), col("neighbor"))
      .agg(count(lit(1)).as("c_co"))
      .filter(col("c_co") >= minCo)
    val cos = Metrics.canonRound(
      col("c_co").cast("double") / (sqrt(col("n_i").cast("double")) * sqrt(col("n_j").cast("double"))), 6)
    val wr = Window.partitionBy("item").orderBy(col("cos").desc, col("neighbor").asc)
    co.join(n.select(col("item"), col("n_ord").as("n_i")), "item")
      .join(n.select(col("item").as("neighbor"), col("n_ord").as("n_j")), "neighbor")
      .select(col("item"), col("neighbor"), col("c_co"), cos.as("cos"))
      .withColumn("rank", row_number().over(wr))
      .filter(col("rank") <= topK)
      .select(col("item"), col("rank"), col("neighbor"), col("c_co"), col("cos"))
      .orderBy("item", "rank")
  }

  val q168 = GQuery(
    "q168_item_cf",
    // registry knobs: maxBasket=8 is the skew guard (TPC-H orders carry
    // ≤7 lines, so it never bites the fixture — it exists for the 100 TB
    // pathological order), minCo=2 is the support floor (c_co=1 cosines
    // are noise and were ~90% of the ranked frame / 60k output rows)
    (s, dir) => itemItemCf(Tables.lineitem(s, dir), topK = 3, maxBasket = 8, minCo = 2L),
    Some("""WITH rb AS (
        SELECT ok, item, row_number() OVER (PARTITION BY ok ORDER BY item) AS r
        FROM (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem)),
      b AS (SELECT ok, item FROM rb WHERE r <= 8),
      n AS (SELECT item, count(*) AS n_ord FROM b GROUP BY item),
      co AS (
        SELECT a.item AS item, b2.item AS neighbor, count(*) AS c_co
        FROM b a JOIN b b2 ON a.ok = b2.ok AND a.item <> b2.item
        GROUP BY 1, 2 HAVING count(*) >= 2),
      scored AS (
        SELECT co.item, co.neighbor, co.c_co,
          floor(CAST(co.c_co AS DOUBLE)
            / (sqrt(CAST(ni.n_ord AS DOUBLE)) * sqrt(CAST(nj.n_ord AS DOUBLE))) * 1e6 + 0.5)/1e6 AS cos
        FROM co JOIN n ni ON ni.item = co.item JOIN n nj ON nj.item = co.neighbor),
      ranked AS (
        SELECT item, neighbor, c_co, cos,
          CAST(row_number() OVER (PARTITION BY item ORDER BY cos DESC, neighbor ASC) AS INTEGER) AS rank
        FROM scored)
      SELECT item, rank, neighbor, c_co, cos FROM ranked
      WHERE rank <= 3 ORDER BY item, rank"""))

  /** STL-lite time-series decomposition of daily order revenue:
    * trend = 7-day CENTERED moving average (full windows only), weekly
    * seasonal = per-weekday mean of the detrended series, residual =
    * the rest — the classic-decomposition complement of the frequency
    * tools (periodogram q93, Fourier design q70). Revenue aggregates in
    * integer CENTS (exact in any order); trend is one IEEE /7.0; the
    * seasonal mean rides exactMean's decimal path on 1e-4-snapped
    * detrended values.
    *
    * Scale: one (date) agg off the fact scan, then windows over the
    * |dates|-sized series frame — never the fact table.
    */
  def stlDecompose(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("rev_cents"))
    val w7 = Window.orderBy("d").rowsBetween(-3, 3)
    val trended = daily
      .withColumn("n_win", count(lit(1)).over(w7))
      .withColumn("trend",
        when(col("n_win") === 7, sum("rev_cents").over(w7).cast("double") / 7.0 / 100.0))
      .withColumn("revenue", col("rev_cents").cast("double") / 100.0)
      .withColumn("detr",
        Metrics.canonRound(col("revenue") - col("trend"), 4))
      .withColumn("wd", graft.functions.DateFeatures.weekdayMon0(col("d")))
    val seasonal = trended.filter(col("detr").isNotNull)
      .groupBy("wd").agg(Metrics.canonRound(Metrics.exactMean(col("detr")), 4).as("seasonal"))
    trended.join(broadcast(seasonal), Seq("wd"), "left")
      .select(col("d").cast("string").as("day"), col("revenue"),
        Metrics.canonRound(col("trend"), 4).as("trend"),
        when(col("detr").isNotNull, col("seasonal")).as("seasonal"),
        Metrics.canonRound(col("detr") - col("seasonal"), 4).as("residual"))
      .orderBy("day")
  }

  val q170 = GQuery(
    "q170_stl_decompose",
    (s, dir) => stlDecompose(Tables.orders(s, dir)),
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS d,
          CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        FROM orders GROUP BY 1),
      tr AS (
        SELECT d, rev_cents,
          count(*) OVER w AS n_win,
          CAST(sum(rev_cents) OVER w AS DOUBLE)/7.0/100.0 AS trend_raw
        FROM daily
        WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      dt AS (
        SELECT d, CAST(rev_cents AS DOUBLE)/100.0 AS revenue,
          CASE WHEN n_win = 7 THEN trend_raw END AS trend,
          CASE WHEN n_win = 7
               THEN floor((CAST(rev_cents AS DOUBLE)/100.0 - trend_raw)*1e4 + 0.5)/1e4 END AS detr,
          isodow(d) - 1 AS wd
        FROM tr),
      seas AS (
        SELECT wd,
          floor((CAST(sum(CAST(floor(detr*1e4+0.5)/1e4 AS DECIMAL(18,4))) AS DOUBLE)/count(*))*1e4 + 0.5)/1e4 AS seasonal
        FROM dt WHERE detr IS NOT NULL GROUP BY wd)
      SELECT CAST(dt.d AS VARCHAR) AS day, dt.revenue,
        floor(dt.trend*1e4 + 0.5)/1e4 AS trend,
        CASE WHEN dt.detr IS NOT NULL THEN s.seasonal END AS seasonal,
        floor((dt.detr - s.seasonal)*1e4 + 0.5)/1e4 AS residual
      FROM dt LEFT JOIN seas s ON s.wd = dt.wd
      ORDER BY day"""))

  /** Benford first-significant-digit audit of order totals — the
    * fraud/synthetic-data screen: naturally-occurring multi-magnitude
    * amounts follow P(d) = log10(1+1/d); a generator or a doctored
    * column does not. First digits come off the canonical DECIMAL
    * rendering (q130's precedent — no float-to-string drift), expected
    * shares are one ln ratio per digit, and the deviation is reported
    * per digit plus the total-variation distance.
    */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val digit = substring(
      Metrics.canonRound(col("o_totalprice"), 2).cast("decimal(18,2)").cast("string"), 1, 1)
      .cast("int")
    val counts = orders.filter(col("o_totalprice") >= 1.0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("n_tot"))
    val obs = col("n").cast("double") / col("n_tot").cast("double")
    val benford = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) / log(lit(10.0))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        Metrics.canonRound(obs, 6).as("obs_share"),
        Metrics.canonRound(benford, 6).as("benford_share"),
        Metrics.canonRound(abs(obs - benford), 6).as("abs_dev"))
      .orderBy("digit")
  }

  val q173 = GQuery(
    "q173_benford_audit",
    (s, dir) => benfordAudit(Tables.orders(s, dir)),
    Some("""WITH c AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice*1e2 + 0.5)/1e2 AS DECIMAL(18,2)) AS VARCHAR), 1, 1) AS INTEGER) AS digit,
          count(*) AS n
        FROM orders WHERE o_totalprice >= 1.0 GROUP BY 1),
      t AS (SELECT sum(n) AS n_tot FROM c)
      SELECT digit, n,
        floor(CAST(n AS DOUBLE)/CAST(n_tot AS DOUBLE)*1e6 + 0.5)/1e6 AS obs_share,
        floor((ln(1.0 + 1.0/CAST(digit AS DOUBLE))/ln(10.0))*1e6 + 0.5)/1e6 AS benford_share,
        floor(abs(CAST(n AS DOUBLE)/CAST(n_tot AS DOUBLE)
                  - ln(1.0 + 1.0/CAST(digit AS DOUBLE))/ln(10.0))*1e6 + 0.5)/1e6 AS abs_dev
      FROM c CROSS JOIN t ORDER BY digit"""))

  /** k-anonymity / l-diversity audit (Sweeney 2002 / Machanavajjhala
    * 2007) — the privacy gate a dataset passes before release: group by
    * the quasi-identifier (nation, market segment), flag groups smaller
    * than k=5 (re-identifiable) and groups whose sensitive attribute
    * (account-balance band) shows fewer than l=3 distinct values
    * (attribute-disclosable even when k-anonymous). One hash agg; the
    * flags are integer comparisons.
    */
  def kAnonymityAudit(customer: DataFrame, k: Int, l: Int): DataFrame = {
    val sens = floor(col("c_acctbal") / 1000.0).cast("long")
    customer
      .select(col("c_nationkey"), col("c_mktsegment"), sens.as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"), countDistinct("bal_band").as("n_sensitive"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
        (col("n") >= k).cast("int").as("k_anonymous"),
        col("n_sensitive"),
        (col("n_sensitive") >= l).cast("int").as("l_diverse"))
      .orderBy("c_nationkey", "c_mktsegment")
  }

  val q174 = GQuery(
    "q174_k_anonymity",
    (s, dir) => kAnonymityAudit(Tables.customer(s, dir), k = 5, l = 3),
    Some("""SELECT c_nationkey, c_mktsegment, count(*) AS n,
        CAST(CASE WHEN count(*) >= 5 THEN 1 ELSE 0 END AS INTEGER) AS k_anonymous,
        count(DISTINCT CAST(floor(c_acctbal/1000.0) AS BIGINT)) AS n_sensitive,
        CAST(CASE WHEN count(DISTINCT CAST(floor(c_acctbal/1000.0) AS BIGINT)) >= 3
             THEN 1 ELSE 0 END AS INTEGER) AS l_diverse
      FROM customer
      GROUP BY c_nationkey, c_mktsegment
      ORDER BY c_nationkey, c_mktsegment"""))

  def all: Seq[GQuery] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21, q22, q23, q24, q25,
    q26, q27, q28, q29, q57, q58, q59, q65, q69, q79, q84, q89, q95, q96, q98,
    q115, q116, q139, q153, q159, q160, q164, q165, q168, q170, q173, q174)
}
