package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the settings every entry point shares.
  *
  * Scale stance: these configs are the local[32] test shape of what a
  * 1000-executor deployment would set cluster-side (AQE on, sensible
  * shuffle partitioning, UTC). Nothing here is semantically load-bearing
  * except the time zone, which the DuckDB oracle comparison requires.
  */
object Session {
  def builder(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // GSH storage-partitioned joins: the catalog resolves the
      // shard_<lo>_<step> clustering transform, and v2 bucketing lets a
      // key-grouped scan's layout reach the planner (off by default
      // upstream out of conservatism; only GShard reports one here).
      // allowJoinKeysSubsetOfPartitionKeys stays OFF (upstream default) —
      // the single-key shard transform needs no subset matching.
      .config("spark.sql.catalog.gshard", "graft.sources.GShardCatalog")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // Recursive CTEs (q209's hierarchy rollup) unroll n·depth rows; the
      // upstream 1M-row seatbelt trips at ~200k nodes × 20 levels (the 10×
      // scale run found it — depth-bounded recursion is linear in data, so
      // the ROW limit is the wrong guard for it). Raise rows to 1e9 and
      // keep the LEVEL limit at its default 100: for depth-bounded
      // hierarchy walks, runaway recursion means runaway DEPTH, and the
      // level limit catches that regardless of data size. A cluster
      // deployment sets the same pair.
      .config("spark.sql.cteRecursionRowLimit", (1000000000).toString)
      // Some fixture generations ship events.ts as INT64 TIMESTAMP(NANOS);
      // Spark's TimestampType is micros-only, so read nanos as Long and let
      // Tables.events normalize (it also handles the TIMESTAMP_NTZ shape).
      // Harmless when the fixture is already micros.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
