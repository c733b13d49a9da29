package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque BINARY columns + typed
  * metadata structs, with decode / feature-extract / frame-sample as
  * per-partition batch transforms (the Scala analog of pandas-UDF
  * batching: one JVM call per partition, vectorizable payloads, never a
  * per-row interpreter crossing).
  *
  * ALL THREE modality decodes are REAL: [[ImageCodec]] encodes/decodes
  * PNG through javax.imageio (ships with the JDK — no external media
  * library needed; q81), [[AudioCodec]] writes and chunk-walks
  * RIFF/WAVE PCM16 (q190), and [[VideoCodec]] walks a length-prefixed
  * frame container (q82). Each proves its byte→sample→statistic path
  * against a DuckDB oracle that re-derives the expected values from the
  * generation parameters. [[FakeCodec]] remains only as the documented
  * stand-in for codecs this container lacks (e.g. an ffmpeg-backed
  * resize); swapping a real library in changes no plan shape.
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
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Two-tone grayscale PNG: rows above h/2 at `topGray`, the rest at
      * `bottomGray` — enough structure that the decoded mean luminance
      * proves real pixel traversal, simple enough that an oracle can
      * recompute it exactly.
      */
    def encodePng(width: Int, height: Int, topGray: Int, bottomGray: Int): Array[Byte] = {
      val raw = new Array[Byte]((width + 1) * height)
      var y = 0
      var off = 0
      while (y < height) {
        raw(off) = 0 // per-scanline filter byte: 0 = None
        off += 1
        val g = (if (y < height / 2) topGray else bottomGray).toByte
        java.util.Arrays.fill(raw, off, off + width, g)
        off += width
        y += 1
      }
      writeGrayPng(width, height, raw)
    }

    /** Minimal spec-compliant PNG writer for 8-bit grayscale: IHDR +
      * one zlib-deflated IDAT of filter-0 scanlines + IEND. Produces
      * genuine PNGs (ImageIO and any other decoder read them back
      * bit-exactly — PNG is lossless), at ~6× the throughput of the
      * ImageIO encoder, whose ColorModel/metadata plumbing dominated the
      * synthesis and re-encode stages (q81/q191/q194/q195 each push the
      * full corpus through this path; the DECODE side deliberately stays
      * javax.imageio so the read is a real third-party codec).
      * `raw` is the filtered scanline stream: height rows of (filter
      * byte 0 + width samples).
      */
    private def writeGrayPng(width: Int, height: Int, raw: Array[Byte]): Array[Byte] = {
      import java.util.zip.{CRC32, Deflater}
      val ihdr = new Array[Byte](13)
      def putInt(a: Array[Byte], o: Int, v: Int): Unit = {
        a(o) = (v >>> 24).toByte; a(o + 1) = (v >>> 16).toByte
        a(o + 2) = (v >>> 8).toByte; a(o + 3) = v.toByte
      }
      putInt(ihdr, 0, width)
      putInt(ihdr, 4, height)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 0 // color type: grayscale
      // compression 0, filter 0, interlace 0 already zero
      val defl = new Deflater(Deflater.BEST_SPEED)
      defl.setInput(raw)
      defl.finish()
      // chunked drain: deflate can exceed input size on incompressible
      // data, so never assume one fixed buffer suffices
      val idat = new ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
      defl.end()
      val idatBytes = idat.toByteArray
      val idatLen = idatBytes.length
      val out = new ByteArrayOutputStream(idatLen + 64)
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      def chunk(tag: String, data: Array[Byte], len: Int): Unit = {
        val hdr = new Array[Byte](4)
        putInt(hdr, 0, len)
        out.write(hdr)
        val tb = tag.getBytes("US-ASCII")
        out.write(tb)
        out.write(data, 0, len)
        val crc = new CRC32()
        crc.update(tb)
        crc.update(data, 0, len)
        val cb = new Array[Byte](4)
        putInt(cb, 0, crc.getValue.toInt)
        out.write(cb)
      }
      chunk("IHDR", ihdr, 13)
      chunk("IDAT", idatBytes, idatLen)
      chunk("IEND", Array.emptyByteArray, 0)
      out.toByteArray
    }

    /** REAL resize: decode the PNG, 2× box-filter downscale (each output
      * sample = floor of the mean of its 2×2 input block — exact integer
      * arithmetic, odd edge row/column dropped), re-encode as PNG. A
      * full byte→pixel→resample→byte round trip; the oracle re-derives
      * the downscaled dimensions and mean luminance in closed form from
      * the two-tone generation parameters.
      */
    def downscale2x(bytes: Array[Byte]): Array[Byte] = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val in = img.getRaster
      val (ow, oh) = (img.getWidth / 2, img.getHeight / 2)
      require(ow >= 1 && oh >= 1, s"image ${img.getWidth}x${img.getHeight} too small to halve")
      val raw = new Array[Byte]((ow + 1) * oh)
      var y = 0
      var off = 0
      while (y < oh) {
        raw(off) = 0
        off += 1
        var x = 0
        while (x < ow) {
          val s = in.getSample(2 * x, 2 * y, 0) + in.getSample(2 * x + 1, 2 * y, 0) +
            in.getSample(2 * x, 2 * y + 1, 0) + in.getSample(2 * x + 1, 2 * y + 1, 0)
          raw(off) = (s / 4).toByte
          off += 1
          x += 1
        }
        y += 1
      }
      writeGrayPng(ow, oh, raw)
    }

    /** 8×8 average-hash (aHash — the LAION-style image-dedup fingerprint)
      * from the DECODED raster: partition the image into an 8×8 grid of
      * bands (band r,c covers rows [r·h/8, (r+1)·h/8) × cols [c·w/8,
      * (c+1)·w/8), integer division), bit(r,c) = band mean > global mean.
      * The comparison is cross-multiplied exact integer arithmetic
      * (bandSum·w·h > total·nr·nc) — no division, no floating point, so
      * the 64 bits are bit-reproducible on any engine. Returns (width,
      * height, 16-hex-char row-major hash — byte r holds bits c=0..7 of
      * grid row r, LSB = c0 — and the set-bit count).
      */
    def aHash8(bytes: Array[Byte]): (Int, Int, String, Int) = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      val raster = img.getRaster
      val (w, h) = (img.getWidth, img.getHeight)
      require(w >= 8 && h >= 8, s"image ${w}x$h too small for an 8x8 hash")
      // band r covers [r*h/8, (r+1)*h/8) — floor boundaries, matching the
      // oracle's integer-division re-derivation exactly
      def bandOf(n: Int): Array[Int] = {
        val m = new Array[Int](n)
        var b = 0
        var i = 0
        while (i < n) {
          while (b < 7 && i >= (b + 1) * n / 8) b += 1
          m(i) = b
          i += 1
        }
        m
      }
      val rowBand = bandOf(h)
      val colBand = bandOf(w)
      val bandSum = Array.ofDim[Long](8, 8)
      var total = 0L
      var y = 0
      while (y < h) {
        val r = rowBand(y)
        var x = 0
        while (x < w) {
          val s = raster.getSample(x, y, 0).toLong
          bandSum(r)(colBand(x)) += s
          total += s
          x += 1
        }
        y += 1
      }
      val area = w.toLong * h
      val sb = new StringBuilder(16)
      var nBits = 0
      var r = 0
      while (r < 8) {
        val nr = ((r + 1) * h / 8) - (r * h / 8)
        var byte = 0
        var c = 0
        while (c < 8) {
          val nc = ((c + 1) * w / 8) - (c * w / 8)
          if (bandSum(r)(c) * area > total * (nr.toLong * nc)) {
            byte |= 1 << c
            nBits += 1
          }
          c += 1
        }
        sb.append(f"$byte%02x")
        r += 1
      }
      (w, h, sb.toString, nBits)
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

  /** REAL audio codec: canonical WAV/RIFF (PCM16 mono, little-endian).
    * encodeWav writes the 44-byte header + samples; decodeStats is a
    * genuine chunk WALKER — it verifies the RIFF/WAVE magics, handles
    * fmt/data chunks in any order, skips unknown chunks with the spec's
    * even-byte padding, and accumulates the sum of squared samples from
    * the decoded PCM (exact integer arithmetic, so the derived RMS is
    * cross-engine deterministic).
    */
  object AudioCodec {
    import java.nio.{ByteBuffer, ByteOrder}

    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
      bb.putShort(1); bb.putShort(1) // PCM, mono
      bb.putInt(sampleRate); bb.putInt(sampleRate * 2) // byte rate = sr * block
      bb.putShort(2); bb.putShort(16) // block align, bits/sample
      bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array
    }

    /** (sample_rate, n_samples, sum of squared samples) from a real
      * header+chunk parse. Rejects non-PCM16-mono payloads loudly.
      */
    def decodeStats(bytes: Array[Byte]): (Int, Long, Long) = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      require(fourcc() == "RIFF", "not a RIFF container")
      bb.getInt // RIFF payload size (trusting remaining() instead)
      require(fourcc() == "WAVE", "not a WAVE stream")
      var sampleRate = -1
      var nSamples = -1L
      var sumSq = 0L
      while (bb.remaining >= 8) {
        val id = fourcc()
        val size = bb.getInt
        id match {
          case "fmt " =>
            val fmt = bb.getShort; val ch = bb.getShort
            sampleRate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            val bits = bb.getShort
            require(fmt == 1 && ch == 1 && bits == 16, "only PCM16 mono supported")
            if (size > 16) bb.position(bb.position() + (size - 16))
          case "data" =>
            nSamples = size / 2
            var i = 0L
            while (i < nSamples) { val s = bb.getShort.toLong; sumSq += s * s; i += 1 }
          case _ => // spec: chunks are padded to even length
            bb.position(bb.position() + size + (size & 1))
        }
      }
      require(sampleRate > 0 && nSamples >= 0, "missing fmt or data chunk")
      (sampleRate, nSamples, sumSq)
    }
  }

  /** REAL (toy but parseable) video container: "GVID" magic, big-endian
    * int width/height/frame-count header, then one length-prefixed blob
    * per frame. decode walks the container frame-by-frame via the length
    * prefixes — the stride is read from the data, not assumed — and
    * cross-checks the walked count against the header.
    */
  object VideoCodec {
    import java.nio.ByteBuffer

    def encode(width: Int, height: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val bb = ByteBuffer.allocate(16 + frames.map(_.length + 4).sum)
      bb.put("GVID".getBytes("US-ASCII"))
      bb.putInt(width); bb.putInt(height); bb.putInt(frames.size)
      frames.foreach { f => bb.putInt(f.length); bb.put(f) }
      bb.array
    }

    /** (width, height, n_frames, sampled (frame_idx, frame_len,
      * first_byte)) for every everyK-th frame. All frames are WALKED
      * (each length prefix read and skipped) so a corrupt stride fails
      * loudly instead of fabricating metadata.
      */
    def sampleFrames(bytes: Array[Byte], everyK: Int): (Int, Int, Int, Seq[(Int, Int, Int)]) = {
      val bb = ByteBuffer.wrap(bytes)
      val magic = new Array[Byte](4); bb.get(magic)
      require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
      val (w, h, nf) = (bb.getInt, bb.getInt, bb.getInt)
      val out = Seq.newBuilder[(Int, Int, Int)]
      var i = 0
      while (bb.remaining >= 4) {
        val len = bb.getInt
        // zero-length frames are legal in the container (encode() writes
        // them); reading "the first byte" of one would either read the
        // NEXT frame's length prefix mid-stream or run past the buffer
        // on a final frame (review finding, r15) — report -1 instead
        if (i % everyK == 0)
          out += ((i, len, if (len == 0) -1 else bb.get(bb.position()) & 0xff))
        bb.position(bb.position() + len)
        i += 1
      }
      require(i == nf, s"header claims $nf frames, walked $i")
      (w, h, nf, out.result())
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

  /** REAL resize stage over PNG payloads: decode → 2× box filter →
    * re-encode, one partition-batched pass. The downstream schema is the
    * same (doc_id, content) an object-store image table carries, so the
    * stage composes with [[extractImageFeatures]] for the verify path.
    */
  def resizeImages(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, ImageCodec.downscale2x(bytes))
      })
      .toDF("doc_id", "content")
  }

  /** Perceptual-hash extraction for image payloads: real PNG decode +
    * 8×8 average-hash per row, one partition-batched pass. Output is the
    * (doc_id, width, height, phash, n_bits) frame image-dedup pipelines
    * bucket on — LAION-style corpus curation groups by this fingerprint
    * and keeps one canonical image per bucket.
    */
  def imagePerceptualHashes(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (w, h, hash, nBits) = ImageCodec.aHash8(bytes)
        (id, w, h, hash, nBits)
      })
      .toDF("doc_id", "width", "height", "phash", "n_bits")
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

  /** Deterministic real-WAV audio table over the docs routed to audio by
    * q80's media-type rule (doc_id % 3 == 1): sample rate and a PCM16
    * waveform derive from (doc_id, n_chars), then the payload is an
    * actual RIFF/WAVE encode.
    */
  def syntheticAudio(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        // sample rate varies over {8k, 16k, 24k} by id % 9 — the audio
        // docs all have id % 3 == 1, so an id % 3 modulus was CONSTANT
        // (16000 for every doc; review finding, r15 — dead variation).
        // id % 9 ∈ {1, 4, 7} on this subset → three real rates.
        val sr = 8000 * (1 + ((id % 9) / 3)).toInt
        val n = 64 + (nChars % 128).toInt
        val samples = Array.tabulate(n)(i => ((id * 37 + i * 17) % 2048 - 1024).toShort)
        (id, AudioCodec.encodeWav(sr, samples))
      })
      .toDF("doc_id", "content")
  }

  /** Real WAV decode + feature extraction: per payload, parse the RIFF
    * chunks and emit (sample_rate, n_samples, sum of squared samples) —
    * the exact-integer base for RMS.
    */
  def extractAudioFeatures(spark: SparkSession, wavs: DataFrame): DataFrame = {
    import spark.implicits._
    wavs.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (sr, n, ss) = AudioCodec.decodeStats(bytes)
        (id, sr, n, ss)
      })
      .toDF("doc_id", "sample_rate", "n_samples", "sum_sq")
  }

  /** Deterministic GVID video table over the docs routed to video by
    * q80's rule (doc_id % 3 == 2): dimensions, frame count, and every
    * frame's length/payload derive from doc_id, then the payload is a
    * real length-prefixed container.
    */
  def syntheticVideos(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 32).toInt
        val h = 12 + (id % 24).toInt
        val nf = 1 + (id % 120).toInt
        val frames = Seq.tabulate(nf) { i =>
          val len = 8 + ((id + i) % 16).toInt
          Array.tabulate(len)(j => ((id * 7 + i * 13 + j) % 256).toByte)
        }
        (id, VideoCodec.encode(w, h, frames))
      })
      .toDF("doc_id", "content")
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

  /** Real frame sampling over GVID containers: decode the header, walk
    * every frame via its length prefix, keep each everyK-th — one row
    * per sampled frame, the shape a caption/embed stage consumes.
    */
  def sampleVideoFrames(spark: SparkSession, videos: DataFrame, everyK: Int = 30): DataFrame = {
    import spark.implicits._
    videos.select(col("doc_id"), col("content"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val (w, h, _, sampled) = VideoCodec.sampleFrames(bytes, everyK)
        sampled.map { case (idx, len, first) => (id, idx, w, h, len, first) }
      })
      .toDF("doc_id", "frame_idx", "width", "height", "frame_len", "first_byte")
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
