package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns + typed
  * metadata structs, with decode / feature-extract / frame-sample as
  * per-partition batch transforms (the Scala analog of pandas-UDF
  * batching: one JVM call per partition, vectorizable payloads, never a
  * per-row interpreter crossing).
  *
  * IMAGE decode is REAL: [[ImageCodec]] encodes/decodes PNG through
  * javax.imageio (ships with the JDK — no external media library
  * needed), and q81 proves the full byte→pixel→statistic path against a
  * DuckDB oracle that re-derives the expected dimensions and mean
  * luminance from the generation parameters. Only VIDEO (and the audio
  * byte-stream stand-in) remain behind [[FakeCodec]], the deterministic
  * stub this container's missing ffmpeg would back; swapping it in
  * changes no plan shape.
  */
object Multimodal {

  case class MediaMeta(media_type: String, byte_len: Long, width: Int, height: Int, n_frames: Int)
  case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  case class MediaFeatures(doc_id: Long, media_type: String, byte_len: Long,
                           width: Int, height: Int, n_frames: Int,
                           brightness: Double, content_hash: Long)

  /** STUB codec: deterministic pseudo-decode. A real deployment replaces
    * decode() with the actual library call; everything downstream is
    * unchanged.
    */
  object FakeCodec {
    /** FNV-1a content hash — computed once per payload and shared by every
      * derived feature (dimensions, content_hash).
      */
    def fnv1a(bytes: Array[Byte]): Long =
      bytes.foldLeft(1469598103934665603L)((a, b) => (a ^ b) * 1099511628211L)

    def decodeFromHash(mediaType: String, h: Long, byteLen: Long): MediaMeta = {
      val w = 64 + math.floorMod(h, 1920).toInt
      val ht = 64 + math.floorMod(h >> 11, 1080).toInt
      val frames = if (mediaType == "video") 1 + math.floorMod(h >> 22, 300).toInt else 1
      MediaMeta(mediaType, byteLen, w, ht, frames)
    }

    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta =
      decodeFromHash(mediaType, fnv1a(bytes), bytes.length.toLong)

    /** STUB brightness: mean byte value scaled — stands in for a decoded-
      * pixel statistic.
      */
    def brightness(bytes: Array[Byte]): Double =
      if (bytes.isEmpty) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / bytes.length / 255.0
  }

  /** REAL image codec over javax.imageio — encode and decode are the
    * actual PNG pipeline, not a hash trick. Images are 8-bit grayscale
    * end to end (PNG stores the samples losslessly, so the decoded
    * raster is bit-exact and every statistic below is deterministic and
    * cross-engine predictable).
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Two-tone grayscale PNG: rows above h/2 at `topGray`, the rest at
      * `bottomGray` — enough structure that the decoded mean luminance
      * proves real pixel traversal, simple enough that an oracle can
      * recompute it exactly.
      */
    def encodePng(width: Int, height: Int, topGray: Int, bottomGray: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        val g = if (y < height / 2) topGray else bottomGray
        var x = 0
        while (x < width) { raster.setSample(x, y, 0, g); x += 1 }
        y += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** (width, height, mean luminance in [0,1]) from the decoded raster.
      * The sum is exact integer arithmetic; the one double division at
      * the end is IEEE-identical cross-engine.
      */
    def decodeStats(bytes: Array[Byte]): (Int, Int, Double) = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
        y += 1
      }
      (w, h, sum.toDouble / (w.toLong * h * 255L).toDouble)
    }
  }

  /** Deterministic real-PNG media table from the documents frame: per
    * doc, dimensions and the two gray levels derive from (doc_id,
    * n_chars), then the payload is an ACTUAL encoded PNG. Stands in for
    * `spark.read.format("binaryFile")` over an object store of images.
    */
  def syntheticImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val w = 8 + (nChars % 24).toInt
        val h = 8 + (id % 16).toInt
        val g1 = (id % 256).toInt
        val g2 = ((id * 31) % 256).toInt
        (id, ImageCodec.encodePng(w, h, g1, g2))
      })
      .toDF("doc_id", "content")
  }

  /** Real decode + feature extraction for image payloads: one
    * partition-batched pass, javax.imageio per row, flat columnar
    * output.
    */
  def extractImageFeatures(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, brightness) = ImageCodec.decodeStats(bytes)
        (id, "image", w, h, brightness)
      })
      .toDF("doc_id", "media_type", "width", "height", "brightness")
  }

  /** Synthesize a media table from any (doc_id, text) frame: text bytes as
    * the opaque payload, round-robin media types. Stands in for
    * `spark.read.format("binaryFile")` over an object store.
    */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("content"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))

  /** Decode + feature-extract as a partition-batched typed transform. The
    * work is embarrassingly parallel with the scan; output is a flat
    * columnar frame ready for relational ops.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, mt) =>
        val h = FakeCodec.fnv1a(bytes) // one byte scan, shared by meta + hash
        val meta = FakeCodec.decodeFromHash(mt, h, bytes.length.toLong)
        MediaFeatures(id, mt, meta.byte_len, meta.width, meta.height, meta.n_frames,
          FakeCodec.brightness(bytes), h)
      })
  }

  /** Resize plumbing (STUB): emits the target-dimension metadata and a
    * proportionally "resized" payload (byte truncation standing in for the
    * pixel resample). Schema and distribution shape are what a real resize
    * stage has; only the codec call is fake.
    */
  def resize(spark: SparkSession, media: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, mt) =>
        val meta = FakeCodec.decode(mt, bytes)
        val scale = math.min(1.0, targetW.toDouble * targetH / (meta.width.toLong * meta.height))
        val outLen = math.max(1, (bytes.length * scale).toInt)
        (id, mt, bytes.take(outLen), targetW, targetH)
      })
      .toDF("doc_id", "media_type", "content", "width", "height")
  }

  /** Frame sampling for video rows: every k-th "frame" (stub: byte-range
    * slices standing in for decoded frames), exploded to one row per
    * sampled frame — the shape a caption/embed stage consumes.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyK: Int = 30): DataFrame = {
    import spark.implicits._
    // decode-only projection: frame sampling needs dimensions, not
    // brightness/content-hash — don't pay extractFeatures' extra passes
    val metas = media.filter(col("media_type") === "video")
      .select(col("doc_id"), col("content"), col("media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions(_.map { case (id, bytes, mt) =>
        val m = FakeCodec.decode(mt, bytes)
        (id, m.width, m.height, m.n_frames)
      })
      .toDF("doc_id", "width", "height", "n_frames")
    metas
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))
  }
}
