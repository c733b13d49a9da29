package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.KmvSketch

/** Streaming-maintained KMV sketch — the sketch-family member of the
  * incremental-maintenance story (q181 maintains a rollup, q215 a band
  * index, this a distinct/overlap sketch): per micro-batch the delta's
  * per-source k-minimum fingerprints merge into the sketch state, and
  * because k-min-of-union is ASSOCIATIVE and COMMUTATIVE
  * (kmin(A ∪ B) = kmin(kmin(A) ∪ kmin(B))), the final state equals the
  * batch-built sketch for ANY micro-batch slicing. The post-stream
  * overlap report is therefore identical to q219's, and q221 reuses
  * q219's oracle VERBATIM — the q179/q181 zero-drift argument.
  *
  * The merge is the q203 foreachBatch idiom: versioned parquet state,
  * idempotent batch-id guard, delta aggregated (to its own k-min)
  * BEFORE the merge so the state table stays k·|sources| rows however
  * large the stream. At 100 TB the sketch state is kilobytes per
  * source — the entire point of maintaining the sketch instead of the
  * corpus.
  */
object SketchStreams {

  /** One merge step: k-min of (state ∪ delta) per source, after
    * dropping duplicate (source, h) rows — the same text may arrive in
    * several batches.
    */
  def mergeStep(state: Option[DataFrame], delta: DataFrame, k: Int): DataFrame = {
    val all = state.map(_.unionByName(delta)).getOrElse(delta)
      .select(col("source"), col("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("source").orderBy("h")
    all.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("source"), col("h"))
  }

  /** Stream the (augmented) corpus in three doc_id-sliced micro-batches,
    * maintain the per-source KMV state, and return q219's overlap report
    * computed from the STREAM-BUILT sketch.
    */
  def streamingKmv(spark: SparkSession, dir: String, k: Int = 32,
                   queryName: String = "stream_kmv"): DataFrame =
    EventStreams.withStreamShufflePartitions(spark) {
      val docs = KmvSketch.augmentedDocs(spark, dir)
      val stage = TempDirs.create("graft_kmv_stage_")
      (0 until 3).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .select(col("source"), col("text"))
          .coalesce(1) // ONE file per slice: maxFilesPerTrigger=1 feeds part
          // FILES, so a multi-part slice silently becomes many tiny
          // micro-batches (q227 measured 24 batches / 23s of engine
          // rounds for 3 intended slices before this)
          .write.mode("overwrite").parquet(s"$stage/slice_$i")
      }
      val stateBase = TempDirs.create("graft_kmv_state_")
      def statePath(v: Long) = s"$stateBase/v$v"
      var version = -1L
      var lastApplied = -1L
      val schema = spark.read.parquet(s"$stage/slice_0").schema
      val applyBatch: (Dataset[Row], Long) => Unit = { (batch, id) =>
        if (id != lastApplied) {
          val delta = KmvSketch.sketch(batch.toDF(), k).select(col("source"), col("h"))
          val prev = if (version < 0) None else Some(spark.read.parquet(statePath(version)))
          mergeStep(prev, delta, k)
            .write.mode("overwrite").parquet(statePath(version + 1))
          version += 1
          lastApplied = id
        }
      }
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$stage/slice_*")
        .writeStream.foreachBatch(applyBatch).queryName(queryName).start()
      try q.processAllAvailable() finally q.stop()
      require(version >= 0, "stream produced no batches")
      KmvSketch.overlapReport(spark, dir, spark.read.parquet(statePath(version)))
    }

  /** Streaming-maintained QUANTILE sketch (q226, the q221 idiom pointed
    * at plans.QuantileSketchAgg): per micro-batch the arriving orders
    * rows aggregate to per-quarter delta sketches (`graft_qsketch`) and
    * merge into the persisted quarter state (`graft_qsketch_merge`) —
    * delta reduced to its own bottom-k BEFORE the merge, so the state
    * stays ≤ k pairs per quarter for any stream size. k-min-of-union
    * associativity makes the final state equal the batch build for ANY
    * slicing, so the returned report is q225's and reuses its oracle
    * verbatim.
    */
  def streamingQuantileSketch(spark: SparkSession, dir: String,
                              queryName: String = "stream_qsketch"): DataFrame =
    EventStreams.withStreamShufflePartitions(spark) {
      import graft.operators.QuantileSketchQueries
      val k = QuantileSketchQueries.K
      val rows = QuantileSketchQueries.base(spark, dir)
        .select(col("qkey"), col("h"), col("v"))
      val stage = TempDirs.create("graft_qsk_stage_")
      (0 until 3).foreach { i =>
        rows.filter(pmod(col("h"), lit(3)) === i)
          .coalesce(1) // ONE file per slice: maxFilesPerTrigger=1 feeds part
          // FILES, so a multi-part slice silently becomes many tiny
          // micro-batches (q227 measured 24 batches / 23s of engine
          // rounds for 3 intended slices before this)
          .write.mode("overwrite").parquet(s"$stage/slice_$i")
      }
      val stateBase = TempDirs.create("graft_qsk_state_")
      def statePath(v: Long) = s"$stateBase/v$v"
      var version = -1L
      var lastApplied = -1L
      val schema = spark.read.parquet(s"$stage/slice_0").schema
      val applyBatch: (Dataset[Row], Long) => Unit = { (batch, id) =>
        if (id != lastApplied) {
          val delta = batch.toDF().groupBy("qkey")
            .agg(call_function("graft_qsketch", col("h"), col("v"), lit(k)).as("sk"))
          val merged = (if (version < 0) delta
            else spark.read.parquet(statePath(version)).unionByName(delta))
            .groupBy("qkey")
            .agg(call_function("graft_qsketch_merge", col("sk"), lit(k)).as("sk"))
          merged.write.mode("overwrite").parquet(statePath(version + 1))
          version += 1
          lastApplied = id
        }
      }
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$stage/slice_*")
        .writeStream.foreachBatch(applyBatch).queryName(queryName).start()
      try q.processAllAvailable() finally q.stop()
      require(version >= 0, "stream produced no batches")
      QuantileSketchQueries.report(spark, dir, spark.read.parquet(statePath(version)))
    }

  /** Streaming-maintained count-min sketch (q247): per micro-batch the
    * arriving documents' feature stream reduces to its own D·W count
    * matrix BEFORE the merge, so the state stays ≤ D·W rows however
    * large the stream; matrix addition is associative and commutative,
    * so the final state equals the batch-built global matrix for any
    * slicing and the post-stream heavy-hitter report is q246's (oracle
    * reused VERBATIM).
    */
  def streamingCms(spark: SparkSession, dir: String,
                   queryName: String = "stream_cms"): DataFrame =
    EventStreams.withStreamShufflePartitions(spark) {
      import graft.operators.CountMinSketch
      val docs = graft.Tables.documents(spark, dir)
      val stage = TempDirs.create("graft_cms_stage_")
      (0 until 3).foreach { i =>
        docs.filter(pmod(col("doc_id"), lit(3)) === i)
          .coalesce(1) // ONE file per slice (the q227 lesson)
          .write.mode("overwrite").parquet(s"$stage/slice_$i")
      }
      val stateBase = TempDirs.create("graft_cms_state_")
      def statePath(v: Long) = s"$stateBase/v$v"
      var version = -1L
      var lastApplied = -1L
      val schema = spark.read.parquet(s"$stage/slice_0").schema
      val applyBatch: (Dataset[Row], Long) => Unit = { (batch, id) =>
        if (id != lastApplied) {
          val delta = CountMinSketch.mergeMatrices(
            CountMinSketch.langMatrices(batch.toDF()))
          val merged = (if (version < 0) delta
            else spark.read.parquet(statePath(version)).unionByName(delta))
            .groupBy("r", "b").agg(sum("c").as("c"))
          merged.write.mode("overwrite").parquet(statePath(version + 1))
          version += 1
          lastApplied = id
        }
      }
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$stage/slice_*")
        .writeStream.foreachBatch(applyBatch).queryName(queryName).start()
      try q.processAllAvailable() finally q.stop()
      require(version >= 0, "stream produced no batches")
      CountMinSketch.heavyHitters(docs, spark.read.parquet(statePath(version)))
    }
}
