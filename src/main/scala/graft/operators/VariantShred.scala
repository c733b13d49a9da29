package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Semi-structured columns on Spark 4's VARIANT type — the engine
  * surface every log/event lake needs: ingest nested JSON documents
  * once, keep them as a binary-shredded VARIANT column, and extract
  * typed paths at query time without a fixed schema.
  *
  * The query builds the nested document itself (orders joined to their
  * sorted lineitem array, serialized with to_json), parses it back with
  * parse_json, and then answers an analytics question purely through
  * VARIANT path extraction:
  *   - scalar paths (`$.cust`, `$.status`) via variant_get,
  *   - array-index paths (`$.lines[0].qty`) — positional access into
  *     the nested array,
  *   - null-safe access (try_variant_get on `$.lines[3]`: orders with
  *     fewer than 4 lines yield NULL, not an error),
  *   - whole-array extraction (variant_get to `array<variant>` for
  *     cardinality, and to a typed `array<struct<...>>` that is
  *     exploded and re-aggregated — pinning the shred as LOSSLESS).
  *
  * The DuckDB oracle computes the same aggregates RELATIONALLY (no JSON
  * at all): if the build → serialize → parse → extract pipeline loses
  * or coerces anything, the hash comparison fails. All JSON leaf values
  * are integers or strings (prices as cents), so no float-formatting
  * ambiguity can hide in the roundtrip.
  *
  * Scale shape: one shuffle to assemble the per-order line array (hash
  * agg on l_orderkey), one equi join to orders, then the VARIANT work is
  * a streamed narrow pass — parse_json and variant_get are per-row
  * expressions, no shuffle. At 100 TB the VARIANT column is what the
  * source would store (shredded binary, columnar-prunable); the
  * fixture's build step stands in for ingest. The final group-by is on
  * (status, prio): ~15 groups, map-side partials collapse everything.
  */
object VariantShred {

  val q54 = GQuery(
    "q54_variant_shred",
    (s, dir) => {
      val l = Tables.lineitem(s, dir)
      // deterministic array order: sort_array on struct sorts by ALL
      // fields in declaration order — the fixture's l_linenumber is NOT
      // unique per order (up to 5 repeats), so the oracle's row_number
      // mirrors the full (ln, qty, price_cents, rf) key; fully-equal
      // structs are interchangeable, so any residual tie is value-free
      val lines = l.groupBy(col("l_orderkey")).agg(
        sort_array(collect_list(struct(
          col("l_linenumber").as("ln"),
          // floor(x + 0.5) / floor(x*100 + 0.5): the house cross-engine
          // idiom — Spark round() (BigDecimal HALF_UP on the shortest
          // repr) vs DuckDB round(), and truncating vs rounding casts,
          // can disagree off the fixture's exact grids (review finding,
          // r15); identical values on the current fixtures
          floor(col("l_quantity") + 0.5).cast("long").as("qty"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_cents"),
          col("l_returnflag").as("rf")))).as("lines"))
      val o = Tables.orders(s, dir)
      val doc = o.join(lines, col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"),
          to_json(struct(
            col("o_custkey").as("cust"),
            col("o_orderstatus").as("status"),
            col("o_orderpriority").as("prio"),
            col("lines"))).as("js"))
      val v = doc.select(col("o_orderkey"), parse_json(col("js")).as("v"))
      val shredded = v.select(
        col("o_orderkey"),
        variant_get(col("v"), "$.cust", "bigint").as("cust"),
        variant_get(col("v"), "$.status", "string").as("status"),
        variant_get(col("v"), "$.prio", "string").as("prio"),
        variant_get(col("v"), "$.lines[0].qty", "bigint").as("first_qty"),
        try_variant_get(col("v"), "$.lines[3].price_cents", "bigint").as("line4_cents"),
        size(variant_get(col("v"), "$.lines", "array<variant>")).cast("long").as("n_lines"),
        // typed whole-array extraction: losslessness of the shred is
        // pinned by summing every line's qty through this path
        aggregate(
          variant_get(col("v"), "$.lines",
            "array<struct<ln:int,qty:bigint,price_cents:bigint,rf:string>>"),
          lit(0L), (acc, x) => acc + x.getField("qty")).as("order_qty"))
      shredded.groupBy(col("status"), col("prio"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("first_qty")).as("sum_first_qty"),
          sum(col("line4_cents")).as("sum_line4_cents"),
          sum(col("n_lines")).as("sum_lines"),
          sum(col("order_qty")).as("sum_qty"),
          max(col("cust")).as("max_cust"))
        .orderBy("status", "prio")
    },
    Some("""WITH ln AS (
        SELECT l_orderkey,
               CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
               CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber,
                                           CAST(floor(l_quantity + 0.5) AS BIGINT),
                                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT),
                                           l_returnflag) AS rn,
               count(*) OVER (PARTITION BY l_orderkey) AS n_lines,
               CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                 OVER (PARTITION BY l_orderkey) AS BIGINT) AS order_qty
        FROM lineitem),
      firsts AS (
        SELECT l_orderkey, qty AS first_qty, n_lines, order_qty
        FROM ln WHERE rn = 1),
      fourths AS (
        SELECT l_orderkey, cents AS line4_cents FROM ln WHERE rn = 4)
      SELECT o.o_orderstatus AS status, o.o_orderpriority AS prio,
        count(*) AS n_orders,
        CAST(sum(f.first_qty) AS BIGINT) AS sum_first_qty,
        CAST(sum(l4.line4_cents) AS BIGINT) AS sum_line4_cents,
        CAST(sum(f.n_lines) AS BIGINT) AS sum_lines,
        CAST(sum(f.order_qty) AS BIGINT) AS sum_qty,
        max(o.o_custkey) AS max_cust
      FROM orders o
      JOIN firsts f ON o.o_orderkey = f.l_orderkey
      LEFT JOIN fourths l4 ON o.o_orderkey = l4.l_orderkey
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  def all: Seq[GQuery] = Seq(q54)
}
