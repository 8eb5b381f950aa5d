package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C12 — multimodal column plumbing: media as opaque `binary` columns with a
 * typed metadata struct, plus batched per-partition feature extraction.
 *
 * Container-level decode is REAL for all three modalities:
 * [[encodedMediaTable]] assembles structurally-valid PNG/JPEG/GIF
 * payloads ([[decodeMeta]] marker-walks them back, q130),
 * [[encodedAudioTable]] WAV/RIFF payloads ([[decodeAudioMeta]]
 * chunk-walks, q131; AAC ADTS frame walks and Ogg Vorbis page walks
 * with real RFC 3533 CRCs live in [[graft.functions.MediaCodecUtil]],
 * q176/q177) and [[encodedVideoTable]] MP4/ISO-BMFF payloads
 * ([[decodeVideoMeta]] box-walks, q132) — all codegen'd Catalyst
 * expressions, all oracle-gated end to end. The PIXEL/SAMPLE stage below
 * the container layer is REAL wherever the JVM suffices: PNG pixels
 * (zlib inflate + full scanline unfiltering), GIF pixels (complete LZW
 * decompression — variable-width codes, clear/KwKwK handling, checked
 * against ImageIO) and WAV PCM samples decode for real inside
 * [[extractFeatures]] via [[graft.functions.PixelCodecUtil]],
 * pixel-exactness cross-checked against the JDK's own readers; baseline
 * JPEG pixels and raw-PCM MP4 audio tracks decode for real too
 * ([[graft.functions.JpegCodecUtil]], `decodeMp4PcmSamples`). Only
 * COMPRESSED audio decode is REAL for the lossless family: FLAC
 * streams (fixed predictors + Rice residuals, CRC-8/16, STREAMINFO
 * MD5 — [[graft.functions.FlacCodecUtil]]) and IMA ADPCM both decode
 * to exact samples inside the feature path. Only LOSSY transform
 * payloads (H.264/HEVC frames, AAC raw_data_blocks, Vorbis audio
 * packets) — psychoacoustic codecs that genuinely need external
 * libraries — keep the deterministic stand-in (`decodeStub`); their
 * CONTAINERS (ADTS frame chains, Ogg pages incl. checksums) parse for
 * real. A production build swaps ONLY the stand-in body for a real
 * decoder (JNI/ffmpeg/etc.) — every surrounding operator, schema and
 * batch shape is unchanged and tested.
 */
object Multimodal {

  val FeatureDim = 16

  final case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  final case class MediaRow(media_id: Long, media: Array[Byte], kind: String,
                            width: Int, height: Int, duration_ms: Long)
  final case class FeatureRow(media_id: Long, kind: String, features: Array[Float])

  /** Wrap a documents-like table into the media schema: the text bytes play
    * the role of an encoded payload; metadata is derived deterministically.
    * (In production this is `spark.read.format("binaryFile")` or a parquet
    * table with a real binary column — same schema from here on.) */
  def asMediaTable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      encode(col(textCol), "UTF-8").as("media"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      (pmod(xxhash64(col(idCol)), lit(1920L)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col(idCol), lit(1)), lit(1080L)) + 1).cast("int").as("height"),
      pmod(xxhash64(col(idCol), lit(2)), lit(600000L)).as("duration_ms"))

  /** Media table whose payloads are REAL image containers: each row gets
    * structurally-valid PNG, JPEG/JFIF (with a doc-dependent
    * variable-length COM segment) or GIF89a bytes whose header geometry
    * derives deterministically from the id — so [[decodeMeta]] exercises
    * a genuine parse, not a fixture. */
  def encodedMediaTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import graft.functions.ImageFunctions.imageBytes
    val kind = pmod(col(idCol), lit(3)).cast("int")
    docs.select(
      col(idCol).as("media_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("gif")), kind + 1).as("kind"),
      imageBytes(kind,
        (pmod(xxhash64(col(idCol)), lit(1900L)) + 1).cast("int"),
        (pmod(xxhash64(col(idCol), lit(1)), lit(1060L)) + 1).cast("int"),
        when(kind === 0, (pmod(col(idCol), lit(2)) + 1) * 8).otherwise(lit(8)).cast("int"),
        pmod(col(idCol), lit(13)).cast("int")).as("media"))
  }

  /** Parse container bytes back to struct(format, width, height, depth)
    * (null for unrecognizable payloads) — the codegen'd marker walk. */
  def decodeMeta(media: Column): Column =
    graft.functions.ImageFunctions.imageMeta(media)

  /** Media table whose payloads are REAL WAV (RIFF) containers:
    * structurally-complete PCM files with a variable-length LIST/INFO
    * comment chunk ahead of `fmt ` (deterministic audio geometry from the
    * id), so [[decodeAudioMeta]] exercises a genuine chunk walk. */
  def encodedAudioTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import graft.functions.MediaFunctions.audioBytes
    docs.select(
      col(idCol).as("media_id"),
      audioBytes(
        element_at(array(lit(8000), lit(16000), lit(22050), lit(44100), lit(48000)),
          (pmod(col(idCol), lit(5)) + 1).cast("int")),
        (pmod(col(idCol), lit(2)) + 1).cast("int"),
        ((pmod(col(idCol), lit(3)) + 1) * 8).cast("int"),
        (pmod(xxhash64(col(idCol)), lit(480L)) + 1).cast("int"),
        pmod(col(idCol), lit(11)).cast("int")).as("media"))
  }

  /** Media table whose payloads are REAL MP4 (ISO BMFF) containers:
    * `ftyp` + variable-length `free` + `moov`/`mvhd` with deterministic
    * timescale/duration from the id — [[decodeVideoMeta]] walks boxes. */
  def encodedVideoTable(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    import graft.functions.MediaFunctions.videoBytes
    docs.select(
      col(idCol).as("media_id"),
      videoBytes(
        element_at(array(lit(600), lit(1000), lit(24000), lit(30000), lit(90000)),
          (pmod(col(idCol), lit(5)) + 1).cast("int")),
        (pmod(xxhash64(col(idCol)), lit(600000L)) + 1),
        pmod(col(idCol), lit(17)).cast("int")).as("media"))
  }

  /** Parse WAV bytes back to struct(format, sample_rate, channels, bits,
    * n_samples) — the codegen'd RIFF chunk walk. */
  def decodeAudioMeta(media: Column): Column =
    graft.functions.MediaFunctions.audioMeta(media)

  /** Parse MP4 bytes back to struct(format, brand, timescale, duration)
    * — the codegen'd ISO BMFF box walk. */
  def decodeVideoMeta(media: Column): Column =
    graft.functions.MediaFunctions.videoMeta(media)

  /**
   * STUB — stands in for the real media decoder on the payloads that
   * genuinely need codec libraries this environment doesn't ship:
   * INTER-FRAME video (H.264/HEVC — motion compensation territory;
   * intra-only MJPEG video decodes for REAL via the sample-table walk +
   * the baseline JPEG codec) and transform audio (AAC; IMA ADPCM
   * compressed audio decodes for real), and any other non-container
   * byte blob. Deterministic: features are a
   * hash-fold of the payload bytes, so tests are exact. PNG pixels
   * (zlib inflate + unfilter), GIF pixels (full LZW), baseline JPEG
   * pixels (Huffman + IDCT), WAV PCM, raw-PCM MP4 tracks
   * ('twos'/'sowt' via the real stsd/stsz/stsc/stco walk) AND IMA ADPCM
   * compressed audio ([[graft.functions.AdpcmCodecUtil]] — the full
   * 4-bit adaptive codec) do NOT hit this — [[decodeFeatures]] decodes
   * those for real via [[graft.functions.PixelCodecUtil]] /
   * [[graft.functions.JpegCodecUtil]] / [[graft.functions.AdpcmCodecUtil]].
   */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) {
      h = h * 31 + payload(i)
      out(i % FeatureDim) += (h % 1000L).toFloat / 1000.0f
      i += 1
    }
    out
  }

  /** C83: 64-bit DIFFERENCE HASH (dHash) of an image payload — the
    * perceptual-dedup fingerprint pixel-exact hashing cannot provide: a
    * re-encode (PNG → JPEG, quality change) alters every byte and most
    * pixels slightly, but the 8×8 grid of "is the left luminance box
    * brighter than its right neighbor" survives, so near-identical images
    * land within a few Hamming bits. Pure integer arithmetic over the
    * REAL decoded pixels (9×8 luminance box means via exact pixel-count
    * division) — deterministic across runs and engines that share the
    * decoders. Returns null for undecodable payloads. */
  def perceptualHash(payload: Array[Byte]): java.lang.Long = {
    import graft.functions.{ImageCodecUtil, PixelCodecUtil, JpegCodecUtil}
    val meta = ImageCodecUtil.parse(payload)
    if (meta == null) return null
    val w = meta.getInt(1); val h = meta.getInt(2)
    val px = {
      val p = PixelCodecUtil.decodePngPixels(payload)
      if (p != null) p else {
        val g = PixelCodecUtil.decodeGifPixels(payload)
        if (g != null) g else JpegCodecUtil.decodeJpegPixels(payload)
      }
    }
    if (px == null || w < 9 || h < 8 || px.length < w * h) return null
    // 9×8 grid of mean luminance, exact integer box sums
    val box = Array.ofDim[Long](8, 9)
    var gy = 0
    while (gy < 8) {
      val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
      var gx = 0
      while (gx < 9) {
        val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            // decoder convention: packed (r<<24 | g<<16 | b<<8 | a)
            val p = px(y * w + x)
            s += (((p >>> 24) & 0xFF) * 299 + ((p >>> 16) & 0xFF) * 587 +
              ((p >>> 8) & 0xFF) * 114) / 1000
            x += 1
          }
          y += 1
        }
        box(gy)(gx) = s / math.max(1, (y1 - y0) * (x1 - x0))
        gx += 1
      }
      gy += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      val r = i / 8; val c = i % 8
      if (box(r)(c) > box(r)(c + 1)) hash |= (1L << i)
      i += 1
    }
    java.lang.Long.valueOf(hash)
  }

  /** C83: image NEAR-DUP pairs via perceptual hash — re-encoded/quality-
    * shifted copies of an image (different bytes, different exact-pixel
    * hashes) pair up when their dHashes differ by ≤ `maxHamming` bits.
    * Candidate generation is the SimHash band trick: 4 × 16-bit bands —
    * any pair within Hamming 3 shares an identical band by pigeonhole
    * (the guarantee band-exact matching gives; wider radii re-run with
    * more/narrower bands) — so candidates come from band-bucket equality
    * joins, never an all-pairs scan, and are verified by exact popcount.
    *
    * Scale: hashing is one mapPartitions decode pass (the extractFeatures
    * shape); the join carries (band, key, id) rows only. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        idCol: String = "media_id",
                        mediaCol: String = "media"): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "band-exact candidates guarantee recall only to Hamming 3")
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Option(perceptualHash(bytes)).map(h => (id, h.longValue()))
      }).toDF(idCol, "phash")
    val bands = hashes.select(col(idCol), col("phash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("phash"), b * 16).bitwiseAND(lit(0xFFFFL)).as("key"))): _*))
        .as("bk"))
      .select(col(idCol), col("phash"), col("bk.band"), col("bk.key"))
    val a = bands.select(col("band"), col("key"),
      col(idCol).as("id_a"), col("phash").as("ph_a"))
    val b = bands.select(col("band"), col("key"),
      col(idCol).as("id_b"), col("phash").as("ph_b"))
    a.join(b, Seq("band", "key")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** FeatureDim stats over real RGBA pixels: per-channel mean and std
    * (8 dims) + an 8-bin luminance histogram, L1-normalized. */
  private def pixelFeatures(px: Array[Int]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    val n = px.length.toFloat
    val sum = new Array[Double](4); val sq = new Array[Double](4)
    val hist = new Array[Int](8)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      var c = 0
      while (c < 4) {
        val v = (p >>> (24 - 8 * c)) & 0xFF
        sum(c) += v; sq(c) += v.toDouble * v
        c += 1
      }
      val lum = (((p >>> 24) & 0xFF) * 299 + ((p >>> 16) & 0xFF) * 587 +
        ((p >>> 8) & 0xFF) * 114) / 1000
      hist(lum >> 5) += 1
      i += 1
    }
    var c = 0
    while (c < 4) {
      val m = sum(c) / n
      out(c) = (m / 255.0).toFloat
      out(4 + c) = (math.sqrt(math.max(0.0, sq(c) / n - m * m)) / 255.0).toFloat
      c += 1
    }
    var b = 0
    while (b < 8) { out(8 + b) = hist(b) / n; b += 1 }
    out
  }

  /** FeatureDim stats over real PCM samples (normalized to [-1, 1] at
    * the given bit depth): mean, RMS, zero-crossing rate, peak + a
    * 12-bin amplitude histogram, L1-normalized. */
  private def sampleFeatures(s: Array[Int], bits: Int): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    if (s.isEmpty) return out
    val scale = 1.0 / (1L << (bits - 1)).toDouble
    val n = s.length.toDouble
    var sum = 0.0; var sq = 0.0; var peak = 0.0; var zc = 0
    val hist = new Array[Int](12)
    var i = 0
    while (i < s.length) {
      val v = s(i) * scale
      sum += v; sq += v * v
      val a = math.abs(v)
      if (a > peak) peak = a
      if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
      hist(math.min(11, (a * 12).toInt)) += 1
      i += 1
    }
    out(0) = (sum / n).toFloat
    out(1) = math.sqrt(sq / n).toFloat
    out(2) = (zc / n).toFloat
    out(3) = peak.toFloat
    var b = 0
    while (b < 12) { out(4 + b) = (hist(b) / n).toFloat; b += 1 }
    out
  }

  /** Per-payload feature dispatch: REAL decode where the JVM suffices
    * (PNG pixels via Inflater+unfilter, WAV PCM samples), stub for the
    * codec-library formats. */
  private[operators] def decodeFeatures(payload: Array[Byte]): Array[Float] = {
    import graft.functions.{MediaCodecUtil, PixelCodecUtil}
    val px = PixelCodecUtil.decodePngPixels(payload)
    if (px != null) return pixelFeatures(px)
    val gp = PixelCodecUtil.decodeGifPixels(payload)
    if (gp != null) return pixelFeatures(gp)
    val jp = graft.functions.JpegCodecUtil.decodeJpegPixels(payload)
    if (jp != null) return pixelFeatures(jp)
    val sm = PixelCodecUtil.decodeWavSamples(payload)
    if (sm != null) {
      val meta = MediaCodecUtil.parseWav(payload)
      return sampleFeatures(sm, meta.getInt(3))
    }
    val mp = PixelCodecUtil.decodeMp4PcmSamples(payload)
    if (mp != null) return sampleFeatures(mp.samples, mp.bits)
    val ad = graft.functions.AdpcmCodecUtil.decodeWavImaAdpcmSamples(payload)
    if (ad != null) return sampleFeatures(ad, 16)
    val fl = graft.functions.FlacCodecUtil.decodeFlac(payload)
    if (fl != null) {
      // interleave channels so stereo features match the WAV/MP4 paths'
      // frame order (zero-crossing stats are order-sensitive)
      val n = fl.samples(0).length
      val inter = new Array[Int](n * fl.channels)
      var i = 0
      while (i < n) {
        var c = 0
        while (c < fl.channels) { inter(i * fl.channels + c) = fl.samples(c)(i); c += 1 }
        i += 1
      }
      return sampleFeatures(inter, fl.bits)
    }
    val mj = PixelCodecUtil.decodeMp4MjpegFrames(payload)
    if (mj != null && mj.frames.nonEmpty)
      return pixelFeatures(Array.concat(mj.frames: _*))
    decodeStub(payload)
  }

  /** Batched per-partition feature extraction — the `mapPartitions` shape a
    * real decoder needs (amortize codec init across a batch; one native
    * context per task, not per row). Typed Dataset in/out keeps encoders
    * explicit. PNG/WAV payloads are REALLY decoded (pixels/samples →
    * stats); other formats use the documented stand-in. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media", "kind", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // production: one decoder context per batch lives here
          batch.iterator.map(r => FeatureRow(r.media_id, r.kind, decodeFeatures(r.media)))
        }
      }
  }

  /** Media table whose payloads are FULL-PIXEL images — ids cycle through
    * PNG (real zlib stream, real CRCs, filter types cycling 0-4 by row),
    * GIF89a (real LZW, id-derived 64-colour palette) and baseline JPEG
    * (real DCT + Annex-K Huffman entropy stream): pixel (x, y) of row id
    * derives deterministically from (id, x, y), so [[extractFeatures]]
    * exercises ALL THREE genuine decode paths end to end. */
  def pixelMediaTable(docs: DataFrame, idCol: String = "doc_id",
                      width: Int = 24, height: Int = 16): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("media_id")).as[Long]
      .map { id =>
        def hash(x: Int, y: Int): Int =
          scala.util.hashing.MurmurHash3.productHash((id, x, y))
        val bytes = (id % 3) match {
          case 0 =>
            graft.functions.PixelCodecUtil.encodePngPixels(width, height,
              (x, y) => hash(x, y) | 0xFF) // opaque alpha
          case 1 =>
            val palette = Array.tabulate(64)(c =>
              scala.util.hashing.MurmurHash3.productHash((id, c)) & 0xFFFFFF)
            graft.functions.PixelCodecUtil.encodeGifPixels(width, height, palette,
              (x, y) => hash(x, y))
          case _ =>
            graft.functions.JpegCodecUtil.encodeJpegPixels(width, height, 85,
              (x, y) => hash(x, y) & 0xFFFFFF)
        }
        (id, bytes)
      }.toDF("media_id", "media")
  }

  /** Metadata-level resize: pure column math (the pixel work happens inside
    * the decode stage at production time; the plan-level contract is this). */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0), lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    media
      .withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling plan for video rows: one row per sampled frame ts. */
  def sampleFrames(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms"), lit(everyMs))))

  /** REAL pixel resize of one image payload (PNG/GIF/JPEG in): decode
    * through the genuine codecs, nearest-neighbor resample with the
    * integer source map `src = (dst·srcDim) div dstDim` (deterministic —
    * no float sampling grid), re-encode as PNG (lossless, our own
    * encoder, so the output is byte-deterministic too). Aspect ratio is
    * preserved under `maxDim`; an image already within bounds returns
    * its ORIGINAL bytes untouched (no decode-re-encode churn on the
    * fast path). Returns null for undecodable payloads — callers route
    * those to the dead-letter side. */
  def resizeImage(payload: Array[Byte], maxDim: Int): Array[Byte] = {
    val r = resizeCore(payload, maxDim)
    if (r == null) null else r._1
  }

  /** Shared resize kernel: (bytes, outWidth, outHeight), null if the
    * payload doesn't decode. Dimensions come out WITH the bytes so the
    * distributed path never re-parses its own output. */
  private def resizeCore(payload: Array[Byte], maxDim: Int): (Array[Byte], Int, Int) = {
    import graft.functions.{ImageCodecUtil, JpegCodecUtil, PixelCodecUtil}
    require(maxDim > 0)
    val meta = ImageCodecUtil.parse(payload)
    if (meta == null) return null
    val w = meta.getInt(1); val h = meta.getInt(2)
    if (w <= 0 || h <= 0) return null
    if (w <= maxDim && h <= maxDim) return (payload, w, h)
    val px = {
      val p = PixelCodecUtil.decodePngPixels(payload)
      if (p != null) p else {
        val g = PixelCodecUtil.decodeGifPixels(payload)
        if (g != null) g else JpegCodecUtil.decodeJpegPixels(payload)
      }
    }
    if (px == null || px.length < w * h) return null
    val m = math.max(w, h)
    val dw = math.max(1, w * maxDim / m)
    val dh = math.max(1, h * maxDim / m)
    (PixelCodecUtil.encodePngPixels(dw, dh,
      (x, y) => px((y * h / dh) * w + (x * w / dw))), dw, dh)
  }

  final case class ResizedRow(media_id: Long, media: Array[Byte],
                              out_width: Int, out_height: Int)

  /** Distributed REAL resize over a media table — the production face of
    * [[resizeMeta]] now that the codecs are real: one decode→resample→
    * re-encode map per row (the codecs are pure JVM, so there is no
    * per-batch context to amortize), undecodable rows dropped to keep
    * the output typed (route them via [[asMediaTable]]'s dead-letter
    * convention upstream if they must be kept). */
  def resizeImages(media: DataFrame, maxDim: Int): Dataset[ResizedRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val r = resizeCore(payload, maxDim)
          if (r == null) Iterator.empty
          else Iterator.single(ResizedRow(id, r._1, r._2, r._3))
        }
      }
  }

  final case class FrameRow(media_id: Long, frame_idx: Int, media: Array[Byte])

  /** REAL video frame sampling — the pixel-level face of [[sampleFrames]]:
    * every `everyN`-th frame of an intra-only (Motion-JPEG) video decodes
    * through the real baseline JPEG codec and re-encodes as a standalone
    * lossless PNG, so downstream image ops (resize, dHash near-dup,
    * feature extraction) run on video frames unchanged. Non-MJPEG
    * payloads yield no rows (inter-frame codecs stay the documented
    * stand-in). */
  def sampleVideoFramePixels(media: DataFrame, everyN: Int = 1): Dataset[FrameRow] = {
    require(everyN >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val mj = graft.functions.PixelCodecUtil.decodeMp4MjpegFrames(payload)
          if (mj == null) Iterator.empty
          else mj.frames.iterator.zipWithIndex
            .filter(_._2 % everyN == 0)
            .map { case (frame, i) =>
              FrameRow(id, i, graft.functions.PixelCodecUtil.encodePngPixels(
                mj.width, mj.height, (x, y) => frame(y * mj.width + x)))
            }
        }
      }
  }
}
