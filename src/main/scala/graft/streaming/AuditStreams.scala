package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingest OBSERVABILITY: the guardrails a production stream
  * runs with, surfaced through Spark's own metric channels rather than
  * extra queries.
  *
  * Two channels, both zero-cost to the data path:
  *   - `observe()` named metrics: per-microbatch aggregates (rows seen,
  *     max event time) computed inside the existing plan and reported
  *     on every StreamingQueryProgress — the input-rate/freshness audit.
  *   - `stateOperators[i].numRowsDroppedByWatermark`: rows silently
  *     discarded because they arrived behind the watermark. SILENT
  *     late-data loss is the classic streaming-pipeline bug — at 100 TB
  *     /day a mis-sized watermark quietly drops a shard's stragglers
  *     and nothing in the OUTPUT says so; this counter is where the
  *     loss becomes visible, per trigger, without a second query.
  *
  * The operator is the q30 tumbling-count shape plus the audit hooks;
  * AuditStreamsSpec drives it with an on-time batch then a
  * behind-the-watermark batch and pins both channels (dropped count
  * exact, observed rows exact per batch).
  */
object AuditStreams {

  /** Tumbling 10-minute counts under a 30-minute watermark, with an
    * `ingest_audit` observation (rows_seen, max_ts) attached BEFORE the
    * watermark so the audit sees every arriving row — including ones
    * the stateful aggregation will drop.
    */
  def windowCounts(stream: DataFrame): DataFrame =
    stream
      .observe("ingest_audit", count(lit(1)).as("rows_seen"),
        max(col("ts")).as("max_ts"))
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
}
