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
 * chunk-walks, q131) and [[encodedVideoTable]] MP4/ISO-BMFF payloads
 * ([[decodeVideoMeta]] box-walks, q132) — all codegen'd Catalyst
 * expressions, all oracle-gated end to end. Only the PIXEL/SAMPLE stage
 * below the container layer is a deterministic stand-in (`decodeStub` —
 * this environment ships no codec libraries): a production build swaps
 * ONLY the body of `decodeStub` for a real decoder (JNI/ffmpeg/etc.) —
 * every surrounding operator, schema and batch shape is unchanged and
 * tested.
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
   * STUB — stands in for the real media decoder. Deterministic: features
   * are a hash-fold of the payload bytes, so tests are exact. The real
   * implementation decodes pixels/samples here; signature and batch shape
   * are the production contract.
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

  /** Batched per-partition feature extraction — the `mapPartitions` shape a
    * real decoder needs (amortize codec init across a batch; one native
    * context per task, not per row). Typed Dataset in/out keeps encoders
    * explicit. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "media", "kind", "width", "height", "duration_ms")
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // production: one decoder context per batch lives here
          batch.iterator.map(r => FeatureRow(r.media_id, r.kind, decodeStub(r.media)))
        }
      }
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
}
