package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.util.QueryExecutionListener

import graft.registry.Registry

/** Registry-wide `Exchange SinglePartition` audit — the automated form of
  * the question every round's plan review asks by hand: does ANY
  * registered query funnel a data-sized frame through one partition?
  * (r15's verdict found the last such site by reading plans; this main
  * makes the "zero left" claim checkable in one run, and keeps it
  * checkable as the registry grows.)
  *
  * Scope (r16 verdict item 1): the audit walks EVERY QueryExecution a
  * query runs, not just its returned frame's. Harness queries execute
  * their real work eagerly inside `fn` — staging writes, checkpointed
  * iteration rounds, foreachBatch state merges — and exactly there is
  * where the r15 funnel lived (the staging `ntile` write jobs), invisible
  * to a walker that only sees the returned plan. A
  * [[org.apache.spark.sql.util.QueryExecutionListener]] registered for
  * the duration of each `fn` call captures every Dataset action and
  * DataFrameWriter command the query executes (success AND failure); each
  * captured executed plan is walked with the same metrics-verified logic
  * as the returned frame. Known residual blind spot, stated so the
  * headline doesn't overclaim: a streaming micro-batch's OWN incremental
  * plan is not a Dataset action and is not captured — but every harness
  * in this library does its state writes through foreachBatch
  * (`batch.write...`), which IS captured.
  *
  * The listener bus is asynchronous, so after `fn` returns the audit
  * drains deterministically: it runs a sentinel action (a 1-row select of
  * a marker column) and waits until the sentinel's QueryExecution arrives
  * — the bus is FIFO, so everything the query executed has arrived before
  * it. No fixed sleeps, no lost events.
  *
  * For every registry query: execute at `sfDir` (noop sink — full plan,
  * the Bench convention), walk the FINAL adaptive plan including query
  * stages and subqueries, and report every shuffle exchange targeting
  * `SinglePartition` with the number of records actually written into
  * it (the exchange's own shuffle-write metric — runtime truth, not an
  * estimate). Rows above `threshold` print as FUNNEL; the exit code is
  * 2 if any exist. Query execution errors are counted and reported
  * SEPARATELY from funnels (both fail the run, but "query crashed" and
  * "data funneled through one partition" are different findings), and an
  * exchange whose metric never populated (-1: planned but never executed
  * at this SF, e.g. behind an AQE-pruned branch) is reported as
  * UNMEASURED rather than silently counted benign.
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

  /** One single-partition exchange observed in an executed plan: `origin`
    * is "returned" (the query's returned frame) or "captured:<action>"
    * (an intermediate QueryExecution the query ran eagerly inside `fn`);
    * `records` is the shuffle-write record count, -1 = never executed.
    */
  final case class Hit(origin: String, records: Long)

  private val SentinelCol = "__spa_sentinel__"

  private final class CaptureListener extends QueryExecutionListener {
    val captured = new ConcurrentLinkedQueue[(String, QueryExecution)]
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      captured.add(funcName -> qe)
    // a FAILED intermediate job still executed work up to the failure —
    // its exchanges carry real metrics and must not escape the walk
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      captured.add(funcName -> qe)
  }

  private def isSentinel(e: (String, QueryExecution)): Boolean =
    try e._2.analyzed.output.exists(_.name == SentinelCol)
    catch { case _: Throwable => false }

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

  private def hitsIn(plan: SparkPlan, origin: String): Seq[Hit] =
    flatten(plan).collect {
      case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition =>
        Hit(origin, recordsIn(e))
    }

  /** Execute the frame and return every single-partition exchange in its
    * final adaptive plan with the record count written into it. The
    * execution MUST run through the frame's OWN QueryExecution
    * (`toRdd` + a discarding action): `df.write`/`df.count` build a
    * SEPARATE QueryExecution, leaving this one's plan unexecuted and
    * every metric zero — the audit then reads "0 records" on every
    * exchange and reports zero funnels forever. PlansSpec pins exactly
    * that failure mode (a deliberate repartition(1) of 10k rows must
    * read 10000, not 0). This path deliberately bypasses SQLExecution,
    * so it never shows up in the capture listener — no double counting.
    */
  private[graft] def singlePartitionHits(df: DataFrame): Seq[Long] = {
    df.queryExecution.toRdd.foreachPartition(_ => ())
    hitsIn(df.queryExecution.executedPlan, "returned").map(_.records)
  }

  /** Run `fn` with a capture listener registered, execute the returned
    * frame, and report single-partition exchanges from BOTH the returned
    * frame's plan and every QueryExecution `fn` ran eagerly (the r16
    * verdict's audit-scope fix — the r15 funnel lived in exactly those
    * intermediate jobs). PlansSpec pins both directions: a deliberate
    * repartition(1) inside an eagerly-executed intermediate write is
    * caught with its true record count, and the benign returned frame
    * does not mask it.
    */
  private[graft] def auditedHits(spark: SparkSession)(fn: => DataFrame): Seq[Hit] = {
    val listener = new CaptureListener
    spark.listenerManager.register(listener)
    try {
      val df = fn
      val returned = singlePartitionHits(df).map(Hit("returned", _))
      // deterministic drain: the bus delivers in order, so once the
      // sentinel's execution arrives, everything `fn` ran has arrived
      spark.range(1).select(lit(1).as(SentinelCol)).collect()
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (!listener.captured.asScala.exists(isSentinel) &&
        System.nanoTime() < deadline) Thread.sleep(20)
      require(listener.captured.asScala.exists(isSentinel),
        "listener bus did not drain within 60s — capture evidence incomplete")
      val captured = listener.captured.asScala.toVector
        .filterNot(isSentinel)
        .flatMap { case (func, qe) =>
          // executedPlan can throw for a query that failed during ANALYSIS
          // (no plan to walk — nothing executed either)
          val plan = try Some(qe.executedPlan) catch { case _: Throwable => None }
          plan.toSeq.flatMap(hitsIn(_, s"captured:$func"))
        }
      returned ++ captured
    } finally spark.listenerManager.unregister(listener)
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val threshold = args.lift(1).map(_.toLong).getOrElse(20000L)
    val only = args.lift(2).map(_.split(",").toSeq)
    val spark = Session.getOrCreate()
    var funnels = 0
    var errors = 0
    var benign = 0
    var unmeasured = 0
    var maxBenign = -1L
    var maxBenignAt = ""
    Registry.all.filter(q => only.forall(_.exists(q.name.contains))).foreach { q =>
      try {
        auditedHits(spark)(q.fn(spark, sfDir)).foreach { h =>
          if (h.records > threshold) {
            funnels += 1
            println(s"[spa] FUNNEL ${q.name} (${h.origin}): ${h.records} records " +
              "into Exchange SinglePartition")
          } else if (h.records < 0) {
            unmeasured += 1
            println(s"[spa] UNMEASURED ${q.name} (${h.origin}): single-partition " +
              "exchange planned but never executed at this SF")
          } else {
            benign += 1
            if (h.records > maxBenign) { maxBenign = h.records; maxBenignAt = q.name }
          }
        }
        spark.sharedState.cacheManager.clearCache()
      } catch {
        case e: Throwable =>
          errors += 1
          println(s"[spa] ERROR ${q.name}: ${e.getMessage}")
      }
    }
    println(s"[spa] done: $funnels funnels, $errors errors, $unmeasured unmeasured, " +
      s"$benign benign single-partition exchanges " +
      s"(largest benign: $maxBenign records in $maxBenignAt; threshold $threshold, sf $sfDir)")
    spark.stop()
    if (funnels > 0 || errors > 0) sys.exit(2)
  }
}
