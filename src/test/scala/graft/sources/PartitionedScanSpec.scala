package graft.sources

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

import graft.SparkSpec

/** q269's partition-pruning claim, pinned from the executed scan's own
  * metrics (the GShardSpec convention for shard pruning): the range
  * predicate on the partition column must be satisfied at the LISTING —
  * the scan reads 3 of ~84 month directories, so pruned-partition count
  * is positive and file I/O tracks kept partitions only. A regression
  * that silently turns the partition filter into a post-scan row filter
  * (e.g. a cast that defeats pruning) keeps the ANSWER right while
  * reading 28× the data — exactly the failure only a metrics pin sees.
  */
class PartitionedScanSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case _ => p.children.flatMap(scans)
  }

  test("q269: the month-range scan reads 3 partitions; the rest are pruned at listing time") {
    val layout = PartitionedScan.writeDatePartitioned(spark, sf001)
    // ground truth: month directories actually on disk
    val dirs = new java.io.File(layout).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ship_month="))
    assert(dirs.length > 10, s"expected a multi-year month layout, saw ${dirs.length} dirs")
    val df = PartitionedScan.monthlyRevenue(spark, layout)
    df.collect() // finalize the adaptive plan and populate scan metrics
    val scan = scans(df.queryExecution.executedPlan) match {
      case Seq(s) => s
      case other => fail(s"expected exactly one file scan, saw ${other.size}")
    }
    // the partition filter must reach the scan node itself
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    val read = scan.metrics("numPartitions").value
    assert(read == 3, s"expected 3 month partitions read, metric says $read")
    val pruned = dirs.length - read
    assert(pruned > 0, s"pruned-partition count must be positive (total ${dirs.length})")
    // one file per month (the repartition-by-month write discipline) —
    // I/O tracks kept partitions, not the table
    assert(scan.metrics("numFiles").value == 3, scan.metrics("numFiles").toString)
  }

  test("q269 answer matches the flat-fixture aggregate (pruning is answer-invisible)") {
    val layout = PartitionedScan.writeDatePartitioned(spark, sf001)
    import org.apache.spark.sql.functions._
    val got = PartitionedScan.monthlyRevenue(spark, layout)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val flat = graft.Tables.lineitem(spark, sf001)
      .withColumn("ship_month", date_format(col("l_shipdate"), "yyyy-MM"))
      .filter(col("ship_month").between("1996-01", "1996-03"))
      .groupBy("ship_month")
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("revenue_c"),
        count(lit(1)).as("n"))
      .orderBy("ship_month")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.sameElements(flat))
  }
}
