package graft

import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.registry.Registry

/** Registry-wide `Exchange SinglePartition` audit — the automated form of
  * the question every round's plan review asks by hand: does ANY
  * registered query funnel a data-sized frame through one partition?
  * (r15's verdict found the last such site by reading plans; this main
  * makes the "zero left" claim checkable in one run, and keeps it
  * checkable as the registry grows.)
  *
  * For every registry query: execute at `sfDir` (noop sink — full plan,
  * the Bench convention), walk the FINAL adaptive plan including query
  * stages and subqueries, and report every shuffle exchange targeting
  * `SinglePartition` with the number of records actually written into
  * it (the exchange's own shuffle-write metric — runtime truth, not an
  * estimate). Rows above `threshold` print as FUNNEL; the exit code is
  * 2 if any exist.
  *
  * What a benign hit looks like: ungrouped global aggregates (a handful
  * of partial-agg rows), tiny bounded frames (per-series/per-group
  * summaries), broadcast prep. Those all write a few hundred records at
  * most — far under any honest threshold. A funnel writes ~the input
  * table's row count.
  *
  * Usage: runMain graft.SinglePartitionAudit [sfDir] [threshold] [only]
  * (defaults /root/testdata/sf0.1, 20000, all queries).
  */
object SinglePartitionAudit {

  private def flatten(pl: SparkPlan): Seq[SparkPlan] = {
    val self = pl match {
      case a: AdaptiveSparkPlanExec => pl +: flatten(a.executedPlan)
      case q: QueryStageExec => pl +: flatten(q.plan)
      case _ => pl +: pl.children.flatMap(flatten)
    }
    self ++ pl.subqueries.flatMap(flatten)
  }

  /** Records written into a single-partition exchange: prefer the
    * exchange's own shuffle-write metric; fall back to the child's
    * numOutputRows. -1 when neither exists (never executed — e.g. a
    * pruned branch).
    */
  private def recordsIn(e: ShuffleExchangeExec): Long =
    e.metrics.get("shuffleRecordsWritten").map(_.value)
      .orElse(e.child.metrics.get("numOutputRows").map(_.value))
      .getOrElse(-1L)

  /** Execute the frame and return every single-partition exchange in its
    * final adaptive plan with the record count written into it. The
    * execution MUST run through the frame's OWN QueryExecution
    * (`toRdd` + a discarding action): `df.write`/`df.count` build a
    * SEPARATE QueryExecution, leaving this one's plan unexecuted and
    * every metric zero — the audit then reads "0 records" on every
    * exchange and reports zero funnels forever. PlansSpec pins exactly
    * that failure mode (a deliberate repartition(1) of 10k rows must
    * read 10000, not 0).
    */
  private[graft] def singlePartitionHits(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
    df.queryExecution.toRdd.foreachPartition(_ => ())
    flatten(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        recordsIn(e)
    }
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toLong).getOrElse(20000L)
    val only = args.lift(2).map(_.split(",").toSeq)
    val spark = Session.getOrCreate()
    var funnels = 0
    var benign = 0
    var maxBenign = -1L
    var maxBenignAt = ""
    Registry.all.filter(q => only.forall(_.exists(q.name.contains))).foreach { q =>
      try {
        val df = q.fn(spark, sfDir)
        singlePartitionHits(df).foreach { n =>
          if (n > threshold) {
            funnels += 1
            println(s"[spa] FUNNEL ${q.name}: $n records into Exchange SinglePartition")
          } else {
            benign += 1
            if (n > maxBenign) { maxBenign = n; maxBenignAt = q.name }
          }
        }
        spark.sharedState.cacheManager.clearCache()
      } catch {
        case e: Throwable =>
          funnels += 1
          println(s"[spa] ERROR ${q.name}: ${e.getMessage}")
      }
    }
    println(s"[spa] done: $funnels funnels/errors, $benign benign single-partition exchanges " +
      s"(largest benign: $maxBenign records in $maxBenignAt; threshold $threshold, sf $sfDir)")
    spark.stop()
    if (funnels > 0) sys.exit(2)
  }
}
