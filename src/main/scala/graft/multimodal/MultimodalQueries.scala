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

  /** Full decode/feature-extract path (stub codec → deterministic fake
    * dims + brightness + content hash). Rows-only.
    */
  val q81 = GQuery(
    "q81_multimodal_features",
    (s, dir) => {
      val media = Multimodal.syntheticMedia(Tables.documents(s, dir))
      Multimodal.extractFeatures(s, media).toDF()
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          col("n_frames"), graft.functions.Metrics.canonRound(col("brightness"), 6).as("brightness"),
          col("content_hash"))
        .orderBy("doc_id")
    },
    None)

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
