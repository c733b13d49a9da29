package graft.streaming

import graft.SparkSpec
import graft.registry.Registry

class StreamingSpec extends SparkSpec {

  test("streaming tumbling agg equals batch tumbling agg (bounded input)") {
    val stream = EventStreams.tumblingCounts(spark, sf001, "spec_stream_tumbling").collect()
    val batch = Registry.queries("q30_tumbling_window")(spark, sf001).collect()
    assert(stream.toSeq == batch.toSeq)
  }

  test("stateful streaming sessionization agrees with the batch window idiom") {
    import org.apache.spark.sql.functions.col
    val streamed = EventStreams.sessionizeStream(spark, sf001, queryName = "spec_stream_sessions")
      .select("user_id", "session_start", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    val batch = Registry.queries("q32_sessionize")(spark, sf001)
      .select(col("user_id"), col("session_start").cast("timestamp"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
    // streaming emits only CLOSED sessions (one open session per user
    // remains in state) — so streamed ⊂ batch, and the complement is at
    // most one session per user.
    val batchSet = batch.map { case (u, ts, n) => (u, ts.toInstant.toEpochMilli, n) }.toSet
    val streamSet = streamed.map { case (u, ts, n) => (u, ts.toInstant.toEpochMilli, n) }.toSet
    assert(streamSet.subsetOf(batchSet),
      s"streamed sessions not found in batch: ${(streamSet -- batchSet).take(3)}")
    val missingPerUser = (batchSet -- streamSet).groupBy(_._1).view.mapValues(_.size)
    assert(missingPerUser.values.forall(_ == 1), "more than one unemitted session for some user")
  }
}
