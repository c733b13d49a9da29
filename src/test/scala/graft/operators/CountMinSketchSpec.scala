package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

/** Count-min sketch (q246/q247): one-sided error, mass conservation,
  * rollup identity, and streamed ≡ batch at sf0.001.
  */
class CountMinSketchSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)

  test("estimates never undercount: est >= exact for EVERY key") {
    val matrix = CountMinSketch.mergeMatrices(
      CountMinSketch.langMatrices(docs)).cache()
    val under = CountMinSketch.heavyHitters(docs, matrix)
      .filter(col("est") < col("exact")).count()
    assert(under == 0)
    matrix.unpersist()
  }

  test("each sketch row conserves the stream mass") {
    val matrix = CountMinSketch.mergeMatrices(CountMinSketch.langMatrices(docs))
    val perRow = matrix.groupBy("r").agg(sum("c").as("mass"))
      .select("mass").distinct().collect()
    assert(perRow.length == 1, "all D rows count the same stream")
    val streamLen = DsirSelect.feats(docs, Seq.empty).count()
    assert(perRow.head.getLong(0) == streamLen)
  }

  test("per-lang rollup equals the single-pass global matrix") {
    val rolled = CountMinSketch.mergeMatrices(CountMinSketch.langMatrices(docs))
    val direct = CountMinSketch.mergeMatrices(
      CountMinSketch.langMatrices(docs.withColumn("lang", lit("all"))))
    assert(rolled.exceptAll(direct).count() == 0)
    assert(direct.exceptAll(rolled).count() == 0)
  }

  test("streamed matrix state yields the batch report row-for-row") {
    val streamed = graft.streaming.SketchStreams.streamingCms(spark, sf001)
      .collect().toSeq
    val batch = CountMinSketch.report(docs).collect().toSeq
    assert(streamed == batch)
  }
}
