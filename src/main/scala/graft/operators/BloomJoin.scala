package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi/anti joins — the "dedup new data against
  * an existing corpus" primitive of a training-data pipeline. Semantics are
  * EXACT (identical to a plain left_semi / left_anti join): the bloom
  * filter only prunes, the residual exact join confirms. What the filter
  * buys at scale is that the shuffle-join only ever sees the rows the
  * sketch could not rule out — for a mostly-novel incoming batch that is a
  * few percent of the input instead of all of it.
  *
  * Build/probe dataflow: the sketch is built DISTRIBUTED (Spark's
  * BloomFilterAggregate — partial sketches per partition, OR-merged), and
  * only the finished ~MBs-sized binary is collected and re-shipped as a
  * literal in the probe-side task binary — the same lifecycle as a
  * broadcast variable. Keys are hashed to long (xxhash64) before insert and
  * probe: the aggregate's native input type, and hash collisions are
  * harmless — they can only route extra rows into the confirming join,
  * never change its outcome.
  *
  * This is the user-controllable twin of Spark's own runtime bloom filter
  * (spark.sql.optimizer.runtime.bloomFilter.*), which only kicks in inside
  * one query's join planning — it cannot span the "reference corpus is one
  * table, probes arrive later" shape this operator serves. Size
  * `expectedItems` to the reference-key cardinality; the aggregate derives
  * bit width (fpp ~3% at 8 bits/key, capped by
  * spark.sql.optimizer.runtime.bloomFilter.maxNumBits).
  */
object BloomJoin {

  private def might(bloom: Array[Byte], key: Column): Column =
    // null keys hash to the seed on the build side too, so coalesce(false)
    // only fires for a null BLOOM (empty reference aggregate input)
    coalesce(call_function("graft_might_contain", lit(bloom), xxhash64(key)), lit(false))

  /** Distributed bloom build over ref's key column; returns the serialized
    * sketch (one row, collected — the broadcast-variable lifecycle).
    */
  def buildBloom(ref: DataFrame, key: String, expectedItems: Long): Array[Byte] = {
    val row = ref.agg(
      call_function("graft_bloom_agg", xxhash64(col(key)), lit(expectedItems)).as("bf")).head()
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** Exact left_semi(big ⋉ ref on key), bloom-pruned. */
  def semi(big: DataFrame, ref: DataFrame, key: String, expectedItems: Long): DataFrame = {
    val bloom = buildBloom(ref, key, expectedItems)
    if (bloom.isEmpty) big.limit(0)
    else big.filter(might(bloom, col(key)))
      .join(ref.select(key).distinct(), Seq(key), "left_semi")
  }

  /** Exact left_anti(big ▷ ref on key), bloom-pruned: rows the sketch rules
    * out skip the join entirely; only might-contain rows are confirmed.
    *
    * The probe side is read TWICE (the definite-novel filter and the
    * confirm branch) — that split is what keeps definite-novel rows out
    * of the shuffle, and two predicate-filtered scans are cheap at scale.
    * If `key` is an EXPENSIVE derived expression, cache the keyed frame
    * before calling (q86 does) or the expression re-evaluates per branch.
    */
  def anti(big: DataFrame, ref: DataFrame, key: String, expectedItems: Long): DataFrame = {
    val bloom = buildBloom(ref, key, expectedItems)
    if (bloom.isEmpty) return big
    val maybe = might(bloom, col(key))
    val definitelyNovel = big.filter(!maybe)
    val confirmed = big.filter(maybe)
      .join(ref.select(key).distinct(), Seq(key), "left_anti")
    definitelyNovel.unionByName(confirmed)
  }
}
