package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import graft.streaming.{EventStreams, TempDirs}
import graft.operators.DedupQueries

object ScratchQ227 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $label ${(System.nanoTime()-t0)/1e9}%.2fs"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Session.getOrCreate()
    val dir = "/root/testdata/sf0.1"
    Tables.lineitem(spark, dir).count()
    t("whole instrumented stream") {
      EventStreams.withStreamShufflePartitions(spark) {
        val edges = t("stage: dedupEdges+cache+count") {
          val e = DedupQueries.dedupEdges(spark, dir).cache(); e.count(); e
        }
        val stage = TempDirs.create("scri_cc_")
        t("stage: slices") {
          (0 until 3).foreach { i =>
            edges.filter(pmod(xxhash64(col("u"), col("v")), lit(3)) === i)
              .write.mode("overwrite").parquet(s"$stage/slice_$i")
          }
        }
        edges.unpersist()
        val stateBase = TempDirs.create("scri_state_")
        def statePath(v: Long) = s"$stateBase/v$v"
        var version = -1L
        var lastApplied = -1L
        val schema = spark.read.parquet(s"$stage/slice_0").schema
        val applyBatch: (Dataset[Row], Long) => Unit = { (batch, id) =>
          if (id != lastApplied) {
            t(s"batch $id applyBatch") {
              val prev = if (version < 0) None else Some(spark.read.parquet(statePath(version)))
              graft.streaming.GraphStreams.mergeStep(prev, batch.toDF().select(col("u"), col("v")))
                .write.mode("overwrite").parquet(statePath(version + 1))
            }
            version += 1; lastApplied = id
          }
        }
        val q = t("stream start") {
          spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
            .parquet(s"$stage/slice_*")
            .writeStream.foreachBatch(applyBatch).queryName("scr_i").start()
        }
        t("processAllAvailable") { q.processAllAvailable() }
        q.stop()
        t("clusterReport") {
          DedupQueries.clusterReport(spark, dir, spark.read.parquet(statePath(version)))
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
