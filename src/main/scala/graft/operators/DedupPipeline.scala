package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus deduplication: the user-facing composite over the
  * dedup primitives — exact dedup first (hash-groupBy), then MinHash-LSH
  * near-dup pairs, then greedy survivor selection (drop any doc that
  * near-matches a lower doc_id).
  *
  * Greedy-by-id is one anti-join over the pair list — no iterative
  * connected components, so it's a fixed 3-shuffle pipeline at any scale.
  * (Chained near-dups A~B~C with A≁C keep only A; acceptable for training-
  * data dedup where over-dropping borderline chains is the safe side.)
  */
object DedupPipeline {

  /** @return surviving documents (same schema as input). */
  def dedupCorpus(docs: DataFrame, estJaccardThreshold: Double = 0.5): DataFrame = {
    // 1. exact: keep min doc_id per identical text
    val exactSurvivors = docs
      .withColumn("__keep", min("doc_id").over(
        org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("__keep"))
      .drop("__keep")
    // 2. near-dup pairs among exact survivors
    val sigs = DedupQueries.minhashSignatures(exactSurvivors)
    val pairs = nearDupPairs(sigs, estJaccardThreshold)
    // 3. drop the higher id of every pair
    exactSurvivors.join(pairs.select(col("id_b").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
  }

  /** Banded candidate pairs with estimated Jaccard above threshold —
    * shares DedupQueries' banding AND its dense-bucket cap (without the
    * cap, templated near-identical corpora reintroduce the O(n²) bucket
    * blowup this pipeline exists to avoid).
    */
  def nearDupPairs(sigs: DataFrame, threshold: Double): DataFrame = {
    val bands = DedupQueries.Bands
    val rows = DedupQueries.NumHashes / bands
    val banded = DedupQueries.capBuckets(DedupQueries.banded(sigs, bands, rows))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    val nMatching = size(filter(
      zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), m => m))
    a.join(b, Seq("band", "bh")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (nMatching.cast("double") / DedupQueries.NumHashes).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }
}
