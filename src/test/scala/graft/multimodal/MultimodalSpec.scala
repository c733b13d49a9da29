package graft.multimodal

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.syntheticMedia(Tables.documents(spark, sf001))

  test("media schema: binary payload + type routing") {
    val schema = media.schema
    assert(schema("content").dataType.typeName == "binary")
    val types = media.select("media_type").distinct().collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and total") {
    val a = Multimodal.extractFeatures(spark, media).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(spark, media.repartition(7)).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq) // partitioning must not change results
    assert(a.length == media.count())
    assert(a.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
    assert(a.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
  }

  test("resize stub keeps schema and caps payload size") {
    val resized = Multimodal.resize(spark, media, 224, 224)
    assert(resized.columns.toSeq == Seq("doc_id", "media_type", "content", "width", "height"))
    assert(resized.count() == media.count())
    val sizes = resized.select(length(col("content"))).collect().map(_.getInt(0))
    assert(sizes.forall(_ >= 1))
    assert(resized.filter(col("width") =!= 224 || col("height") =!= 224).count() == 0)
  }

  test("frame sampling only emits video rows at the sampled grain") {
    val frames = Multimodal.sampleFrames(spark, media, everyK = 30)
    val perDoc = frames.groupBy("doc_id").count()
    val videoIds = media.filter(col("media_type") === "video")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(frames.select("doc_id").distinct().collect().map(_.getLong(0)).toSet.subsetOf(videoIds))
    assert(frames.filter(col("frame_idx") % 30 =!= 0).count() == 0)
    assert(perDoc.filter(col("count") < 1).count() == 0)
  }
}
