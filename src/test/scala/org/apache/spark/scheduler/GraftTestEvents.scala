package org.apache.spark.scheduler

/** Test-only factory for scheduler events whose constructors are
  * `private[spark]` (the standard spark-testing-base trick: a shim
  * compiled into an org.apache.spark subpackage). Used by PlansSpec to
  * feed SYNTHETIC task-end events into SinglePartitionAudit's SQL-bus
  * listener — the structural-twin corner it pins (two identically-shaped
  * single-partition exchanges in one streaming batch, only one executed)
  * cannot be provoked from a real stream on demand, so the spec drives
  * the listener with hand-built events instead.
  */
object GraftTestEvents {

  /** A successful task-end for `stageId`/`partitionIndex` carrying one
    * accumulator update (`accumId` += `update`).
    */
  def taskEndWithUpdate(stageId: Int, partitionIndex: Int,
      accumId: Long, update: Long): SparkListenerTaskEnd = {
    val info = new TaskInfo(taskId = 1L, index = partitionIndex, attemptNumber = 0,
      partitionId = partitionIndex, launchTime = 0L, executorId = "driver",
      host = "localhost", taskLocality = TaskLocality.PROCESS_LOCAL,
      speculative = false)
    info.finishTime = 1L // finished && !failed && !killed => successful
    info.setAccumulables(Seq(new AccumulableInfo(accumId,
      Some("shuffle records written"), Some(java.lang.Long.valueOf(update)),
      None, internal = true, countFailedValues = false, metadata = None)))
    SparkListenerTaskEnd(stageId, 0, "ResultTask", org.apache.spark.Success,
      info, new org.apache.spark.executor.ExecutorMetrics(), null)
  }
}
