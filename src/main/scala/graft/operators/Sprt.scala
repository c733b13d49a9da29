package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Wald's Sequential Probability Ratio Test (Wald 1945) per event
  * stream — the ONLINE decision complement of the retrospective
  * monitors: q196's CUSUM localizes a changepoint after the fact and
  * q171's z-test reads a fixed-horizon A/B; SPRT is the test that stops
  * a ramp/canary EARLY, the moment the evidence crosses a boundary,
  * with both error rates controlled at any stopping time (the "peeking"
  * that invalidates a fixed-horizon test is exactly what SPRT
  * licenses).
  *
  * H0: success rate p₀ = 0.30 vs H1: p₁ = 0.40, α = β = 0.05. After n
  * observations with k successes the log-likelihood ratio is
  * k·ln(p₁/p₀) + (n−k)·ln((1−p₁)/(1−p₀)); accept H1 at ≥ ln((1−β)/α),
  * H0 at ≤ ln(β/(1−α)). The increments are scaled to 1e-6-grid INTEGER
  * literals shared verbatim with the oracle (the q198 DCG-weight
  * precedent — no transcendental function runs at query time), so the
  * cumulative walk and both boundary compares are engine-exact.
  *
  * Engine shape: one cumulative window per stream (ordered by event
  * time, event_id tiebreak) + one struct-min aggregate for the FIRST
  * boundary crossing + one struct-max for the no-decision fallback.
  * At 100 TB the window partitions by stream key — the walk is
  * inherently sequential PER STREAM (that is the statistic's
  * definition), and streams are independent, so parallelism is the
  * stream count; a fleet of canaries scales out, a single stream is
  * bounded by its own decision time (SPRT's expected n is exactly what
  * the operator is for: ~E[n]=λ·boundary/drift, far below any fixed
  * horizon).
  */
object Sprt {

  private val L1 = 287682L // floor(1e6·ln(0.40/0.30) + 0.5)
  private val L0 = -154151L // floor(1e6·ln(0.60/0.70) + 0.5)
  private val Bound = 2944439L // floor(1e6·ln(0.95/0.05) + 0.5)

  /** Per event type: walk the (ts, event_id)-ordered stream with
    * success = value > 50, emit the first boundary crossing (decision,
    * n, k, scaled LLR) or the end-of-stream state when no boundary is
    * hit.
    */
  def decisions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = events
      .select(col("event_type"), col("ts"), col("event_id"),
        when(col("value") > 50.0, 1L).otherwise(0L).as("succ"))
      .withColumn("n", row_number().over(
        Window.partitionBy("event_type").orderBy("ts", "event_id")).cast("long"))
      .withColumn("k", sum(col("succ")).over(w))
      .withColumn("llr_micro", col("k") * L1 + (col("n") - col("k")) * L0)
    val first = walk
      .filter(col("llr_micro") >= Bound || col("llr_micro") <= -Bound)
      .groupBy("event_type")
      .agg(min(struct(col("n"), col("k"), col("llr_micro"))).as("s"))
      .select(col("event_type"), col("s.n").as("n_dec"), col("s.k").as("k_dec"),
        col("s.llr_micro").as("llr_micro"))
    val last = walk.groupBy("event_type")
      .agg(max(struct(col("n"), col("k"), col("llr_micro"))).as("s"))
      .select(col("event_type"), col("s.n").as("n_end"), col("s.k").as("k_end"),
        col("s.llr_micro").as("llr_end"))
    last.join(first, Seq("event_type"), "left")
      .select(
        col("event_type"),
        when(col("n_dec").isNull, lit("continue"))
          .when(col("llr_micro") >= Bound, lit("accept_h1"))
          .otherwise(lit("accept_h0")).as("decision"),
        coalesce(col("n_dec"), col("n_end")).as("n"),
        coalesce(col("k_dec"), col("k_end")).as("k"),
        coalesce(col("llr_micro"), col("llr_end")).as("llr_micro"))
      .orderBy("event_type")
  }

  /** q207: SPRT early-stopping readout over the five event streams. */
  val q207 = GQuery(
    "q207_sprt_decision",
    (s, dir) => decisions(Tables.events(s, dir)),
    Some(s"""WITH walk AS (
        SELECT event_type,
               row_number() OVER w AS n,
               CAST(sum(CASE WHEN value > 50 THEN 1 ELSE 0 END) OVER w AS BIGINT) AS k
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)),
      l AS (
        SELECT event_type, n, k, k * ${L1} + (n - k) * (${L0}) AS llr_micro
        FROM walk),
      first AS (
        SELECT event_type, min(n) AS n_dec FROM l
        WHERE llr_micro >= ${Bound} OR llr_micro <= -${Bound}
        GROUP BY event_type),
      firstrow AS (
        SELECT l.event_type, l.n AS n_dec, l.k AS k_dec, l.llr_micro
        FROM l JOIN first f ON l.event_type = f.event_type AND l.n = f.n_dec),
      lastrow AS (
        SELECT l.event_type, l.n AS n_end, l.k AS k_end, l.llr_micro AS llr_end
        FROM l JOIN (SELECT event_type, max(n) AS mn FROM l GROUP BY event_type) m
          ON l.event_type = m.event_type AND l.n = m.mn)
      SELECT la.event_type,
             CASE WHEN fr.n_dec IS NULL THEN 'continue'
                  WHEN fr.llr_micro >= ${Bound} THEN 'accept_h1'
                  ELSE 'accept_h0' END AS decision,
             coalesce(fr.n_dec, la.n_end) AS n,
             coalesce(fr.k_dec, la.k_end) AS k,
             coalesce(fr.llr_micro, la.llr_end) AS llr_micro
      FROM lastrow la LEFT JOIN firstrow fr ON la.event_type = fr.event_type
      ORDER BY la.event_type"""))

  def all: Seq[GQuery] = Seq(q207)
}
