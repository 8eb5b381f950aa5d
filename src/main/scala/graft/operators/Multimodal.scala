package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C12 — multimodal column plumbing: media as opaque `binary` columns with a
 * typed metadata struct, plus batched per-partition feature extraction.
 *
 * Container-level decode is REAL: [[encodedMediaTable]] assembles
 * structurally-valid PNG/JPEG/GIF payloads and [[decodeMeta]] parses
 * format/geometry/depth back out of the bytes with the codegen'd
 * marker-walking [[graft.functions.ImageMeta]] (oracle-gated end to end
 * by q130). Only the PIXEL/SAMPLE stage below the container layer is a
 * deterministic stand-in (`decodeStub` — this environment ships no codec
 * libraries): a production build swaps ONLY the body of `decodeStub` for
 * a real pixel decoder (JNI/ffmpeg/etc.) — every surrounding operator,
 * schema and batch shape is unchanged and tested.
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
