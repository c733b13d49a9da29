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

  test("real PNG codec round-trips dimensions and exact mean luminance") {
    // encode with javax.imageio, decode with javax.imageio — the decoded
    // stats must equal the closed-form values the q81 oracle computes
    val cases = Seq((8, 8, 0, 255), (31, 9, 17, 200), (224, 13, 255, 255), (9, 24, 128, 1))
    cases.foreach { case (w, h, g1, g2) =>
      val bytes = Multimodal.ImageCodec.encodePng(w, h, g1, g2)
      // a real PNG, not a stub: magic bytes
      assert((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
      val (dw, dh, bright) = Multimodal.ImageCodec.decodeStats(bytes)
      assert((dw, dh) == (w, h))
      val expected = (g1.toLong * (h / 2) * w + g2.toLong * (h - h / 2) * w).toDouble /
        (w.toLong * h * 255L).toDouble
      assert(bright == expected, s"($w,$h,$g1,$g2): $bright vs $expected")
    }
  }

  test("q81 image features run the real decode path across partitionings") {
    val imgs = Multimodal.syntheticImages(Tables.documents(spark, sf001))
    val a = Multimodal.extractImageFeatures(spark, imgs).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getDouble(4))).sortBy(_._1)
    val b = Multimodal.extractImageFeatures(spark, imgs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getDouble(4))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.forall { case (_, w, h, br) => w >= 8 && w < 32 && h >= 8 && h < 24 && br >= 0 && br <= 1 })
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
