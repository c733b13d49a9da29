package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the physical-design knob PLANS.md calls out:
  * co-bucketing orders and lineitem on orderkey makes their join
  * shuffle-free (both sides pre-hashed into the same bucket layout at
  * write time). At 100 TB this converts the one unavoidable fact⋈fact
  * shuffle into a local zip of bucket files.
  */
object Bucketing {

  /** Write df as a bucketed managed table (bucketBy requires the table
    * catalog; plain file writes can't carry bucket metadata).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
                    sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
  }

  /** True if the physical plan of `df` contains no shuffle exchange —
    * the property co-bucketed joins buy. ANY non-broadcast Exchange
    * counts (hash, range, single-partition): the original
    * hash-only grep would have certified a plan with a range or
    * singleton shuffle as "shuffle-free" (review finding, r15).
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator
      .exists(l => l.contains("Exchange") && !l.contains("BroadcastExchange"))
}
