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

  val all: Seq[GQuery] = Seq(q232)
}
