package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic shuffled-shard export — the training-data writer shape:
  * a reproducible global shuffle (seeded hash order, so re-running the
  * pipeline yields byte-identical shards) split into N shards of
  * near-equal size, each internally ordered by the same hash.
  *
  * Scale design: NO global sort/row_number — shard = hash % N is computed
  * row-local from the seed and id, so the export is one hash shuffle on
  * the shard key followed by a partition-local sort and write. At 100 TB
  * with 1000 executors this is the same plan; shard count just rises.
  * The hash is md5-derived (not xxhash64) so the shard assignment and
  * within-shard order are engine-portable — q120 hash-verifies the full
  * manifest (per-shard doc sequence digests) against DuckDB.
  */
object ShardExport {

  /** 60-bit seeded shuffle hash: first 15 hex chars of md5(seed:id),
    * parsed base-16 — always non-negative.
    */
  def shuffleHash(id: Column, seed: String): Column =
    conv(substring(md5(concat_ws(":", lit(seed), id)), 1, 15), 16, 10).cast("long")

  def shardOf(id: Column, nShards: Int, seed: String): Column =
    pmod(shuffleHash(id, seed), lit(nShards)).cast("int")

  /** Write `docs` as `nShards` shuffled shards under `outDir/shard=K/`,
    * each shard file internally ordered by (shuffle hash, id). One
    * shuffle, one write pass.
    */
  def write(docs: DataFrame, idCol: String, outDir: String,
            nShards: Int, seed: String): Unit =
    docs
      .withColumn("__h", shuffleHash(col(idCol), seed))
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), col(idCol))
      .drop("__h")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)

  /** The export manifest: per-shard doc/token counts and the md5 digest of
    * the exact within-shard doc sequence (what `write` lays down).
    */
  def manifest(docs: DataFrame, idCol: String, tokCol: Column,
               nShards: Int, seed: String): DataFrame =
    docs
      .select(col(idCol).as("__id"), tokCol.as("__tok"))
      .withColumn("__h", shuffleHash(col("__id"), seed))
      .withColumn("shard", pmod(col("__h"), lit(nShards)).cast("int"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("__tok").as("n_tokens"),
        md5(array_join(
          transform(array_sort(collect_list(struct(col("__h"), col("__id")))),
            x => x.getField("__id").cast("string")), ",")).as("seq_md5"))
      .orderBy("shard")
}
