package graft.multimodal

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Registry coverage for the multimodal plumbing. The binary payloads are
  * synthesized from documents.text (no media fixture ships), so the
  * metadata surface stays oracle-checkable while the decode stage is the
  * documented stub.
  */
object MultimodalQueries {

  /** Binary column + typed metadata: the oracle-checkable slice (type
    * routing, payload length).
    */
  val q80 = GQuery(
    "q80_multimodal_meta",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(Tables.documents(s, dir))
      Multimodal.extractFeatures(s, media).toDF()
        .select(col("doc_id"), col("media_type"), col("byte_len"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
      CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      CAST(strlen(text) AS BIGINT) AS byte_len
      FROM documents ORDER BY doc_id"""))

  /** REAL image decode/feature-extract: deterministic PNGs are encoded
    * with javax.imageio, decoded back pixel-by-pixel, and the oracle
    * re-derives width/height/mean-luminance from the generation
    * parameters — so a decode that skipped real pixels (or a codec
    * that wasn't lossless) would hash-mismatch. The brightness term:
    * top h//2 rows at gray doc_id%256, the rest at (doc_id·31)%256,
    * mean = Σsamples/(w·h·255) — exact integer sum, one IEEE division.
    */
  val q81 = GQuery(
    "q81_multimodal_features",
    (s, dir) => {
      val images = Multimodal.syntheticImages(Tables.documents(s, dir))
      Multimodal.extractImageFeatures(s, images)
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          graft.functions.Metrics.canonRound(col("brightness"), 6).as("brightness"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, 'image' AS media_type,
      CAST(8 + n_chars % 24 AS INTEGER) AS width,
      CAST(8 + doc_id % 16 AS INTEGER) AS height,
      floor(
        CAST((doc_id % 256) * ((8 + doc_id % 16) // 2)
           + ((doc_id * 31) % 256) * ((8 + doc_id % 16) - (8 + doc_id % 16) // 2) AS DOUBLE)
        * (8 + n_chars % 24)
        / CAST((8 + n_chars % 24) * (8 + doc_id % 16) * 255 AS DOUBLE)
        * 1e6 + 0.5)/1e6 AS brightness
      FROM documents ORDER BY doc_id"""))

  /** Frame sampling for video rows (explode to per-frame grain). Rows-only. */
  val q82 = GQuery(
    "q82_frame_sample",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(Tables.documents(s, dir))
      Multimodal.sampleFrames(s, media, everyK = 30)
        .orderBy("doc_id", "frame_idx")
    },
    None)

  def all: Seq[GQuery] = Seq(q80, q81, q82)
}
