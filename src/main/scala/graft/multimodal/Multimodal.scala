package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns + typed
  * metadata structs, with decode / feature-extract / frame-sample as
  * per-partition batch transforms (the Scala analog of pandas-UDF
  * batching: one JVM call per partition, vectorizable payloads, never a
  * per-row interpreter crossing).
  *
  * The actual codec calls are STUBBED — this container ships no image/
  * audio libraries — behind [[FakeCodec]], a deterministic stand-in that
  * derives plausible dimensions from the bytes. The Spark-side surface
  * (schema, partitioning, batch shape) is real and tested; swapping
  * FakeCodec for javax.imageio / ffmpeg bindings changes no plan shape.
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
