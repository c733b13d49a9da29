package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** EXACT k-th order statistic per group WITHOUT a global sort — the
  * third quantile path next to q69 (exact, sort-based `percentile`) and
  * q139 (approximate, mergeable histogram CDF): iterative B-ary range
  * narrowing, the classic two-pass selection generalized to a loop.
  *
  * Each round runs ONE aggregation computing per-(group, bucket) counts
  * over each unfinished group's current [lo, hi] range; the driver
  * descends into the bucket holding the k-th element and subtracts the
  * mass below it. A group finishes when its in-range population fits
  * `leafLimit`, at which point its remaining values are fetched and the
  * answer selected locally. Rounds = ceil(log_B(n / leaf)) — at 100 TB
  * with B = 4096 that is 2-3 full scans, each embarrassingly parallel
  * map-side partial counting, versus the full shuffle-sort of ORDER BY.
  *
  * Driver state is O(groups) plus per-round O(groups·B) bucket counts
  * and one final ≤ leafLimit value fetch per group — all bounded model
  * state, never corpus-sized. The group column is assumed LOW
  * CARDINALITY (event types, sources, shards); for high-cardinality
  * groups use q69's aggregation form, which shuffles by group instead.
  */
object ExactSelect {

  /** group → (n, k, k-th smallest value of valueCol within the group),
    * where k = kOf(n) (1-based, ascending). Values must be non-null
    * doubles.
    */
  def kthPerGroup(df: DataFrame, groupCol: String, valueCol: String,
      kOf: Long => Long, buckets: Int = 4096, leafLimit: Int = 4096,
      maxRounds: Int = 20): Map[String, (Long, Long, Double)] = {
    val base = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("v")).filter(col("v").isNotNull)
    // one prepass: n, min, max per group
    val stats = base.groupBy("g")
      .agg(count(lit(1)).as("n"), min("v").as("lo"), max("v").as("hi"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    var open: Map[String, (Double, Double)] = // g -> current [lo, hi]
      stats.collect { case (g, (_, lo, hi)) if lo != hi => g -> (lo, hi) }
    var done: Map[String, Double] =
      stats.collect { case (g, (_, lo, hi)) if lo == hi => g -> lo }
    var round = 0
    while (open.nonEmpty && round < maxRounds) {
      round += 1
      // Per-row code: -2 = below the group's range, 0..B-1 = in-range
      // bucket (v == hi clamps to B-1), fall-through -1 = above range or
      // finished group. The k-th target is re-derived EVERY round from
      // this round's own partition (k − below-count), so IEEE boundary
      // raggedness between a round's floor() buckets and the next
      // round's range compare cannot lose mass — the ranges are widened
      // one ulp per descent precisely so the target always stays inside.
      val bucketExpr: Column = open.foldLeft(lit(-1L)) { case (acc, (g, (lo, hi))) =>
        val w = (hi - lo) / buckets
        when(col("g") === g && col("v") < lo, lit(-2L))
          .when(col("g") === g && col("v") >= lo && col("v") <= hi,
            least(lit(buckets - 1L),
              greatest(lit(0L), floor((col("v") - lit(lo)) / lit(w)).cast("long"))))
          .otherwise(acc)
      }
      val counts = base.withColumn("b", bucketExpr).filter(col("b") =!= -1L)
        .groupBy("g", "b").agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (g, rows) =>
          g -> rows.toSeq.map(r => r.getLong(1) -> r.getLong(2)).sortBy(_._1)
        }
      val next = scala.collection.mutable.Map[String, (Double, Double)]()
      open.foreach { case (g, (lo, hi)) =>
        val w = (hi - lo) / buckets
        val cs: Seq[(Long, Long)] = counts.getOrElse(g, Seq.empty[(Long, Long)])
        val below = cs.collectFirst { case (-2L, c) => c }.getOrElse(0L)
        var kRem = kOf(stats(g)._1) - below
        require(kRem > 0, s"selection target below range for group $g")
        var sel = -1L
        var selCount = 0L
        val it = cs.filter(_._1 >= 0).iterator
        while (sel < 0 && it.hasNext) {
          val (b, c) = it.next()
          if (kRem <= c) { sel = b; selCount = c } else kRem -= c
        }
        require(sel >= 0, s"selection lost mass for group $g in [$lo,$hi]")
        val nLo = math.nextDown(lo + sel * w)
        val nHi = if (sel == buckets - 1L) hi else math.nextUp(lo + (sel + 1) * w)
        if (selCount <= leafLimit || nHi - nLo <= 0 || round == maxRounds) {
          // leaf: aggregate the bucket per DISTINCT value (same bucket
          // expression, so exactly the counted rows) and select by
          // cumulative walk — bounded by the bucket's value vocabulary
          // even when one value carries millions of duplicates
          val vcs = base.withColumn("b", bucketExpr)
            .filter(col("g") === g && col("b") === sel)
            .groupBy("v").agg(count(lit(1)).as("c"))
            .collect().map(r => r.getDouble(0) -> r.getLong(1)).sortBy(_._1)
          var kk = kRem
          var picked = Double.NaN
          val vi = vcs.iterator
          while (picked.isNaN && vi.hasNext) {
            val (v, c) = vi.next()
            if (kk <= c) picked = v else kk -= c
          }
          require(!picked.isNaN, s"leaf selection lost mass for group $g")
          done += g -> picked
        } else next += g -> (nLo, nHi)
      }
      open = next.toMap
    }
    require(open.isEmpty, s"selection did not converge for ${open.keys}")
    stats.map { case (g, (n, _, _)) => g -> (n, kOf(n), done(g)) }
  }

  /** q202: exact median and p90 of `events.value` per event type via the
    * narrowing selection — ORDER-BY-free order statistics, the form that
    * scales when a global sort would not. The oracle picks the same
    * 1-based order statistics by row_number, which is algorithm-agnostic:
    * any correct selection must return the identical stored double.
    */
  val q202 = GQuery(
    "q202_exact_kth",
    (s, dir) => {
      val e = Tables.events(s, dir)
      val med = kthPerGroup(e, "event_type", "value", n => (n + 1) / 2)
      val p90 = kthPerGroup(e, "event_type", "value", n => math.ceil(0.9 * n).toLong)
      import s.implicits._
      med.toSeq.map { case (g, (n, _, m)) => (g, n, m, p90(g)._3) }
        .toDF("event_type", "n", "median", "p90")
        .orderBy("event_type")
    },
    Some("""WITH n AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY 1),
      r AS (
        SELECT event_type, value,
          row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
        FROM events),
      med AS (
        SELECT r.event_type, r.value FROM r JOIN n USING (event_type)
        WHERE rn = (n.n + 1) // 2),
      p90 AS (
        SELECT r.event_type, r.value FROM r JOIN n USING (event_type)
        WHERE rn = CAST(ceil(0.9 * n.n) AS BIGINT))
      SELECT n.event_type, n.n, med.value AS median, p90.value AS p90
      FROM n JOIN med USING (event_type) JOIN p90 USING (event_type)
      ORDER BY event_type"""))

  def all: Seq[GQuery] = Seq(q202)
}
