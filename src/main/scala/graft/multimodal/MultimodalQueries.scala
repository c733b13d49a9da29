package graft.multimodal

import org.apache.spark.sql.functions._

import graft.Tables
import graft.registry.GQuery

/** Registry coverage for the multimodal plumbing. No media fixture
  * ships, so payloads are synthesized deterministically from the
  * documents frame — but the codecs are REAL: q81 decodes actual PNGs
  * (javax.imageio), q190 parses actual RIFF/WAVE audio, and q82 walks an
  * actual length-prefixed video container. Every decode output is
  * oracle-checked against a DuckDB re-derivation of the generation
  * parameters.
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

  /** REAL video frame sampling: each video doc carries an actual GVID
    * container (magic + dims + frame-count header, length-prefixed
    * frames); the decoder walks every frame via its length prefix and
    * keeps each 30th. The oracle re-derives frame indices, lengths, and
    * first bytes from the generation parameters — a decoder that
    * skipped the walk (or mis-read a stride) would mismatch.
    */
  val q82 = GQuery(
    "q82_frame_sample",
    (s, dir) => {
      val videos = Multimodal.syntheticVideos(Tables.documents(s, dir))
      Multimodal.sampleVideoFrames(s, videos, everyK = 30)
        .orderBy("doc_id", "frame_idx")
    },
    Some("""SELECT doc_id,
      CAST(i AS INT) AS frame_idx,
      CAST(16 + doc_id % 32 AS INT) AS width,
      CAST(12 + doc_id % 24 AS INT) AS height,
      CAST(8 + (doc_id + i) % 16 AS INT) AS frame_len,
      CAST((doc_id * 7 + i * 13) % 256 AS INT) AS first_byte
      FROM (SELECT doc_id, unnest(range(0, 1 + doc_id % 120, 30)) AS i
            FROM documents WHERE doc_id % 3 = 2)
      ORDER BY doc_id, frame_idx"""))

  /** REAL audio decode: each audio doc carries an actual RIFF/WAVE
    * payload (PCM16 mono); the decoder chunk-walks the container and the
    * RMS comes from the decoded samples' exact integer sum of squares.
    * The oracle re-derives sample rate, count, and RMS from the
    * generation parameters.
    */
  val q190 = GQuery(
    "q190_audio_features",
    (s, dir) => {
      val wavs = Multimodal.syntheticAudio(Tables.documents(s, dir))
      Multimodal.extractAudioFeatures(s, wavs)
        .select(col("doc_id"), col("sample_rate"),
          col("n_samples").cast("int").as("n_samples"),
          graft.functions.Metrics.canonRound(
            sqrt(col("sum_sq").cast("double") / col("n_samples")), 6).as("rms"))
        .orderBy("doc_id")
    },
    Some("""WITH samp AS (
        SELECT doc_id, unnest(range(0, 64 + n_chars % 128)) AS i
        FROM documents WHERE doc_id % 3 = 1)
      SELECT doc_id,
        CAST(8000 * (1 + doc_id % 3) AS INT) AS sample_rate,
        CAST(count(*) AS INT) AS n_samples,
        floor(sqrt(CAST(sum(((doc_id * 37 + i * 17) % 2048 - 1024) * ((doc_id * 37 + i * 17) % 2048 - 1024)) AS DOUBLE) / count(*)) * 1e6 + 0.5) / 1e6 AS rms
      FROM samp GROUP BY doc_id ORDER BY doc_id"""))

  /** REAL image resize: decode → 2× box filter (floor of each 2×2 block
    * mean, exact integers) → PNG re-encode → decode again for stats.
    * The oracle derives the downscaled mean in closed form from the
    * two-tone layout: oh output rows = oh//2 pure-top rows, one mixed
    * row iff the tone boundary is odd (value (g1+g2)//2), the rest pure
    * bottom — a resampler that blurred, clipped, or mis-aligned the
    * block grid would hash-mismatch.
    */
  val q191 = GQuery(
    "q191_image_resize",
    (s, dir) => {
      val images = Multimodal.syntheticImages(Tables.documents(s, dir))
      val resized = Multimodal.resizeImages(s, images)
      Multimodal.extractImageFeatures(s, resized)
        .select(col("doc_id"), col("media_type"), col("width"), col("height"),
          graft.functions.Metrics.canonRound(col("brightness"), 6).as("brightness"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (
        SELECT doc_id,
          (8 + n_chars % 24) // 2 AS ow,
          (8 + doc_id % 16) // 2 AS oh,
          doc_id % 256 AS g1,
          (doc_id * 31) % 256 AS g2
        FROM documents)
      SELECT doc_id, 'image' AS media_type,
        CAST(ow AS INTEGER) AS width,
        CAST(oh AS INTEGER) AS height,
        floor(CAST((oh // 2) * g1 + (oh % 2) * ((g1 + g2) // 2)
            + (oh - oh // 2 - oh % 2) * g2 AS DOUBLE) / (oh * 255.0) * 1e6 + 0.5) / 1e6 AS brightness
      FROM p ORDER BY doc_id"""))

  def all: Seq[GQuery] = Seq(q80, q81, q82, q190, q191)
}
