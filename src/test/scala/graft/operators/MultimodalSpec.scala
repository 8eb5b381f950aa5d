package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** C12 — multimodal plumbing: schema, deterministic (stubbed) decode,
  * metadata ops, frame-sampling expansion. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val media = Multimodal.asMediaTable(docs)

  test("media table has the binary + typed-metadata schema") {
    val sch = media.schema
    assert(sch("media").dataType == BinaryType)
    assert(Seq("media_id", "kind", "width", "height", "duration_ms").forall(sch.fieldNames.contains))
    val kinds = media.select("kind").distinct().as[String].collect().toSet
    assert(kinds.subsetOf(Set("image", "audio", "video")))
    assert(media.filter(col("width") < 1 || col("height") < 1).count() == 0)
  }

  test("feature extraction is deterministic with the contract dim") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 32).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    val f2 = Multimodal.extractFeatures(media.repartition(7), batchSize = 8).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(f1.keySet == f2.keySet && f1.keySet.size == docs.count())
    assert(f1.values.forall(_.size == Multimodal.FeatureDim))
    assert(f1 == f2, "features must not depend on partitioning or batch size")
  }

  test("metadata resize preserves aspect and respects maxDim") {
    val resized = Multimodal.resizeMeta(media, maxDim = 256)
      .select("width", "height", "out_width", "out_height")
      .as[(Int, Int, Int, Int)].collect()
    resized.foreach { case (w, h, ow, oh) =>
      assert(ow <= 257 && oh <= 257) // ceil rounding tolerance
      assert(ow <= w && oh <= h, "never upscale")
      if (w > 256 || h > 256) assert(math.max(ow, oh) >= 256, "long edge lands on maxDim")
    }
  }

  test("frame sampling emits one row per sampled timestamp, video only") {
    val frames = Multimodal.sampleFrames(media, everyMs = 60000)
    assert(frames.select("kind").distinct().as[String].collect().toSeq == Seq("video"))
    val one = media.filter(col("kind") === "video").select("media_id", "duration_ms")
      .as[(Long, Long)].head()
    val n = frames.filter(col("media_id") === one._1).count()
    assert(n == one._2 / 60000 + 1)
  }

  test("extracted features feed the ANN stack end-to-end: a payload copy is its own top hit") {
    // the media -> features -> similarity composition a multimodal dedup
    // pipeline runs; a planted byte-identical payload must come back as
    // the nearest neighbor at cosine 1 (the decode stub is deterministic)
    val copy = media.filter(col("media_id") === 7)
      .withColumn("media_id", lit(100007L))
    val feats = Multimodal.extractFeatures(media.unionByName(copy)).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val top = graft.operators.Similarity.bruteForceTopK(
        feats, feats.filter(col("vec_id") === 100007L), k = 1)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].head()
    assert(top._1 == 7L && top._2 > 0.999999,
      s"byte-identical media must be the top neighbor at cosine 1, got $top")
  }
}
