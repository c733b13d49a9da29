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
    // encode with the minimal writer, decode with javax.imageio (a real
    // third-party codec) — the decoded stats must equal the closed-form
    // values the q81 oracle computes
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

  test("minimal PNG writer is raster-bitwise-identical to an ImageIO encode") {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    val cases = Seq((8, 8, 0, 255), (31, 9, 17, 200), (224, 13, 255, 255), (9, 24, 128, 1))
    cases.foreach { case (w, h, g1, g2) =>
      // reference: the same two-tone image through the ImageIO encoder
      val ref = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach { y =>
        val g = if (y < h / 2) g1 else g2
        (0 until w).foreach(x => ref.getRaster.setSample(x, y, 0, g))
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(ref, "png", bos)
      def raster(bytes: Array[Byte]): Seq[Int] = {
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        assert((img.getWidth, img.getHeight) == ((w, h)))
        for (y <- 0 until h; x <- 0 until w) yield img.getRaster.getSample(x, y, 0)
      }
      assert(raster(Multimodal.ImageCodec.encodePng(w, h, g1, g2)) == raster(bos.toByteArray),
        s"raster drift at ($w,$h,$g1,$g2)")
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

  test("2x box downscale: exact block means, odd edges dropped") {
    // 4x4 two-tone (boundary even): output 2x2 = rows of pure tones
    val a = Multimodal.ImageCodec.downscale2x(
      Multimodal.ImageCodec.encodePng(4, 4, 100, 200))
    assert(Multimodal.ImageCodec.decodeStats(a) ==
      ((2, 2, (100.0 * 2 + 200.0 * 2) * 2 / (2L * 2 * 255).toDouble / 2)))
    // 6x6, boundary hh=3 odd: middle output row mixes floor((g1+g2)/2)
    val b = Multimodal.ImageCodec.downscale2x(
      Multimodal.ImageCodec.encodePng(6, 6, 10, 255))
    val (bw, bh, bright) = Multimodal.ImageCodec.decodeStats(b)
    assert((bw, bh) == (3, 3))
    val expected = (10L + (10 + 255) / 2 + 255L).toDouble * 3 /
      (3L * 3 * 255).toDouble
    assert(bright == expected, s"$bright vs $expected")
    // 9x9 odd dims: rightmost column + bottom row dropped -> 4x4
    val c = Multimodal.ImageCodec.downscale2x(
      Multimodal.ImageCodec.encodePng(9, 9, 0, 255))
    assert(Multimodal.ImageCodec.decodeStats(c)._1 == 4)
    assert(Multimodal.ImageCodec.decodeStats(c)._2 == 4)
  }

  test("real WAV codec round-trips rate, count, and exact sum of squares") {
    val cases = Seq(
      (8000, Array[Short](0, 100, -100, 32767, -32768)),
      (16000, Array.tabulate(191)(i => ((i * 17) % 2048 - 1024).toShort)),
      (24000, Array[Short](5)))
    cases.foreach { case (sr, samples) =>
      val bytes = Multimodal.AudioCodec.encodeWav(sr, samples)
      // a real RIFF header, not a stub
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF")
      assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
      val (dsr, dn, dss) = Multimodal.AudioCodec.decodeStats(bytes)
      assert(dsr == sr && dn == samples.length)
      assert(dss == samples.map(s => s.toLong * s).sum)
    }
    // the walker skips unknown chunks (with odd-length padding) instead
    // of breaking — splice a junk chunk between fmt and data
    val base = Multimodal.AudioCodec.encodeWav(8000, Array[Short](3, -4))
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0)
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8) // fix RIFF size
    assert(Multimodal.AudioCodec.decodeStats(spliced) == ((8000, 2L, 25L)))
  }

  test("GVID codec walks frames by length prefix and verifies the header") {
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6, 7, 8, 9))
    val bytes = Multimodal.VideoCodec.encode(320, 240, frames)
    val (w, h, nf, all) = Multimodal.VideoCodec.sampleFrames(bytes, everyK = 1)
    assert((w, h, nf) == (320, 240, 3))
    assert(all == Seq((0, 3, 1), (1, 1, 4), (2, 5, 5)))
    val (_, _, _, sampled) = Multimodal.VideoCodec.sampleFrames(bytes, everyK = 2)
    assert(sampled.map(_._1) == Seq(0, 2))
    // a corrupt frame-count header fails loudly, not silently
    val corrupt = bytes.clone()
    corrupt(15) = 9 // header nFrames byte
    intercept[IllegalArgumentException] {
      Multimodal.VideoCodec.sampleFrames(corrupt, everyK = 1)
    }
  }

  test("GVID zero-length frames sample as first_byte -1, mid-stream and final (review finding, r15)") {
    // a zero-length frame used to read the NEXT frame's length prefix
    // (mid-stream) or run past the buffer (final frame)
    val frames = Seq(Array.empty[Byte], Array[Byte](7, 8), Array.empty[Byte])
    val bytes = Multimodal.VideoCodec.encode(16, 12, frames)
    val (_, _, nf, all) = Multimodal.VideoCodec.sampleFrames(bytes, everyK = 1)
    assert(nf == 3)
    assert(all == Seq((0, 0, -1), (1, 2, 7), (2, 0, -1)))
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

  test("8x8 average-hash: exact integer band comparisons on the real raster") {
    // uniform image: no band can exceed the global mean → all-zero hash
    val flat = Multimodal.ImageCodec.aHash8(Multimodal.ImageCodec.encodePng(16, 16, 100, 100))
    assert(flat == ((16, 16, "00000000000000000000000000000000".take(16), 0)))
    // bright top / dark bottom, h divisible by 8: top 4 grid rows set,
    // bottom 4 clear — bytes are row-major, LSB = leftmost column band
    val (w, h, hash, n) = Multimodal.ImageCodec.aHash8(Multimodal.ImageCodec.encodePng(16, 16, 200, 10))
    assert((w, h) == ((16, 16)))
    assert(hash == "ffffffff00000000" && n == 32)
    // dark top / bright bottom flips every bit of the previous case
    val (_, _, inv, nInv) = Multimodal.ImageCodec.aHash8(Multimodal.ImageCodec.encodePng(16, 16, 10, 200))
    assert(inv == "00000000ffffffff" && nInv == 32)
    // non-multiple-of-8 dims exercise the floor band boundaries; the
    // hash must be partition-layout independent end to end
    val imgs = Multimodal.syntheticImages(Tables.documents(spark, sf001))
    val a = Multimodal.imagePerceptualHashes(spark, imgs).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getInt(4))).sortBy(_._1)
    val b = Multimodal.imagePerceptualHashes(spark, imgs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getInt(4))).sortBy(_._1)
    assert(a.toSeq == b.toSeq)
    assert(a.forall { case (_, ph, nb) => ph.length == 16 && nb >= 0 && nb <= 64 })
  }
}
