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
        CAST(8000 * (1 + (doc_id % 9) // 3) AS INT) AS sample_rate,
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

  /** Shared closed-form re-derivation of the 8×8 average-hash from the
    * two-tone generation parameters. Row band r covers rows
    * [r·h/8, (r+1)·h/8) (integer division, the codec's convention); with
    * column-constant rows the cross-multiplied band-vs-global comparison
    * reduces to S_r·h > T·nr where S_r is the band's row-gray sum and T
    * the whole image's — so each grid row contributes a uniform 0x00 or
    * 0xff byte. A decoder with a mis-aligned band grid, a lossy codec,
    * or a divide-and-round hash would all mismatch.
    */
  private val phashCte = """p AS (
        SELECT doc_id, 8 + n_chars % 24 AS w, 8 + doc_id % 16 AS h,
               doc_id % 256 AS g1, (doc_id * 31) % 256 AS g2
        FROM documents),
      b AS (
        SELECT doc_id, w, h, g1, g2, h // 2 AS ntop, r,
               (r * h) // 8 AS lo, ((r + 1) * h) // 8 AS hi
        FROM p CROSS JOIN (SELECT unnest(range(0, 8)) AS r)),
      bits AS (
        SELECT doc_id, w, h, r,
          CASE WHEN (greatest(0, least(hi, ntop) - lo) * g1
                   + (hi - lo - greatest(0, least(hi, ntop) - lo)) * g2) * h
                  > (ntop * g1 + (h - ntop) * g2) * (hi - lo)
               THEN 1 ELSE 0 END AS bit
        FROM b),
      ph AS (
        SELECT doc_id,
          CAST(max(w) AS INTEGER) AS width, CAST(max(h) AS INTEGER) AS height,
          string_agg(CASE WHEN bit = 1 THEN 'ff' ELSE '00' END, '' ORDER BY r) AS phash,
          CAST(8 * sum(bit) AS INTEGER) AS n_bits
        FROM bits GROUP BY doc_id)"""

  /** REAL perceptual hashing: decode each PNG, compute the 8×8
    * average-hash from the actual raster (exact cross-multiplied integer
    * band-mean comparisons — no floats anywhere), emit the row-major hex
    * fingerprint. One scan, embarrassingly parallel, no shuffle before
    * the orderBy; at 100 TB this is the map stage every image-dedup run
    * starts with.
    */
  val q194 = GQuery(
    "q194_image_phash",
    (s, dir) => {
      val images = Multimodal.syntheticImages(Tables.documents(s, dir))
      Multimodal.imagePerceptualHashes(s, images)
        .orderBy("doc_id")
    },
    Some(s"""WITH $phashCte
      SELECT doc_id, width, height, phash, n_bits FROM ph ORDER BY doc_id"""))

  /** Image dedup rollup by perceptual hash: per source, image count,
    * distinct-fingerprint count, the largest duplicate cluster, and the
    * dup ratio — the numbers a LAION-style curation run reports before
    * keeping one canonical image per bucket. Two hash aggregations
    * (source×phash, then source); the doc_id→source metadata join is an
    * equi join on the table key. Crucially there is NO pair enumeration:
    * grouping by fingerprint is the shape that survives 100 TB, where a
    * within-bucket pair join would go quadratic in the dup clusters.
    */
  val q195 = GQuery(
    "q195_phash_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val hashes = Multimodal.imagePerceptualHashes(s, Multimodal.syntheticImages(docs))
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      hashes.groupBy("source", "phash")
        .agg(count(lit(1)).as("n"))
        .groupBy("source")
        .agg(
          sum(col("n")).as("n_images"),
          count(lit(1)).as("n_clusters"),
          max(col("n")).as("max_cluster"))
        .withColumn("dup_ratio",
          graft.functions.Metrics.canonRound(
            lit(1.0) - col("n_clusters").cast("double") / col("n_images"), 4))
        .orderBy("source")
    },
    Some(s"""WITH $phashCte,
      cl AS (
        SELECT d.source, h.phash, count(*) AS n
        FROM ph h JOIN documents d USING (doc_id)
        GROUP BY d.source, h.phash)
      SELECT source,
        CAST(sum(n) AS BIGINT) AS n_images,
        count(*) AS n_clusters,
        CAST(max(n) AS BIGINT) AS max_cluster,
        floor((1.0 - CAST(count(*) AS DOUBLE) / sum(n)) * 1e4 + 0.5) / 1e4 AS dup_ratio
      FROM cl GROUP BY source ORDER BY source"""))

  def all: Seq[GQuery] = Seq(q80, q81, q82, q190, q191, q194, q195)
}
