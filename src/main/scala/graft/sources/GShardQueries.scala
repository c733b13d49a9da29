package graft.sources

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Registry surface for the GSH DataSource V2 reader: stage the
  * documents table as range-sharded binary files, read them back
  * through the custom source with a doc_id range filter (planning-time
  * shard pruning + row skip) and a text-free projection (payload-skip
  * column pruning), and hash-verify the aggregate against DuckDB
  * reading the same rows from parquet. Each invocation stages into its
  * own temp dir (concurrent Verify workers never collide); staging cost
  * is one scan + one shuffle at fixture scale.
  */
object GShardQueries {

  val q232 = GQuery(
    "q232_gshard_scan",
    (s, dir) => {
      val stage = graft.streaming.TempDirs.create("gshard-q232-").toString
      GShard.write(Tables.documents(s, dir), stage, nShards = 8)
      s.read.format("graft.sources.GShardSource").load(stage)
        .filter(col("doc_id") >= 100 && col("doc_id") < 400)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
          min("doc_id").as("min_id"), max("doc_id").as("max_id"))
        .orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM documents WHERE doc_id >= 100 AND doc_id < 400
      GROUP BY source ORDER BY source"""))

  /** Micro-batch streaming read of the custom format (q236): the staged
    * shard directory plays back as a genuine multi-batch stream
    * (maxFilesPerTrigger=3 over 8 shards → 3 batches through
    * GShardMicroBatchStream's file-count offsets); per batch the
    * per-source partials merge into versioned state (the q203 idiom).
    * Counts are a set property of the corpus ⇒ the final state is
    * slicing-independent and equals the batch aggregate, so the oracle
    * is a plain GROUP BY over the parquet twin.
    */
  val q236 = GQuery(
    "q236_gshard_stream",
    (s, dir) => graft.streaming.EventStreams.withStreamShufflePartitions(s) {
      val stage = graft.streaming.TempDirs.create("gshard-q236-").toString
      GShard.write(Tables.documents(s, dir), stage, nShards = 8)
      val stateBase = graft.streaming.TempDirs.create("gshard-q236-state-")
      def statePath(v: Long) = s"$stateBase/v$v"
      var version = -1L
      var lastApplied = -1L
      val applyBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
        (batch, id) => if (id != lastApplied) {
          val delta = batch.groupBy("source")
            .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
          val merged = (if (version < 0) delta
            else s.read.parquet(statePath(version)).unionByName(delta))
            .groupBy("source")
            .agg(sum("n_docs").as("n_docs"), sum("sum_chars").as("sum_chars"))
          merged.write.mode("overwrite").parquet(statePath(version + 1))
          version += 1
          lastApplied = id
        }
      val q = s.readStream.format("graft.sources.GShardSource")
        .option("maxFilesPerTrigger", 3)
        .load(stage)
        .writeStream.foreachBatch(applyBatch).queryName("gshard_stream").start()
      try q.processAllAvailable() finally q.stop()
      require(version >= 0, "stream produced no batches")
      s.read.parquet(statePath(version)).orderBy("source")
    },
    Some("""SELECT source, count(*) AS n_docs,
        CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents GROUP BY source ORDER BY source"""))

  /** Aggregate pushdown (q237): a filterless, ungrouped COUNT(*) /
    * MIN / MAX(doc_id) over the custom format is answered ENTIRELY from
    * the 24-byte shard footers at planning time — zero row decodes (the
    * spec pins the lastAggPushed flag and that a grouped/filtered query
    * declines the pushdown). The scan-free metadata query every lakehouse
    * format optimizes; here the zone maps double as the statistics.
    */
  val q237 = GQuery(
    "q237_gshard_footer_stats",
    (s, dir) => {
      val stage = graft.streaming.TempDirs.create("gshard-q237-").toString
      GShard.write(Tables.documents(s, dir), stage, nShards = 8)
      s.read.format("graft.sources.GShardSource").load(stage)
        .selectExpr("count(*) AS n_docs", "min(doc_id) AS min_id",
          "max(doc_id) AS max_id")
    },
    Some("""SELECT count(*) AS n_docs, min(doc_id) AS min_id,
        max(doc_id) AS max_id
      FROM documents"""))

  val all: Seq[GQuery] = Seq(q232, q236, q237)
}
