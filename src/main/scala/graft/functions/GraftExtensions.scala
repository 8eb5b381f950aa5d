package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * SparkSessionExtensions hook registering graft's native expressions under
 * SQL names, so `spark.sql("SELECT dot_product(a, b) ...")` works next to
 * the Column API (`VectorFunctions.dotProduct`). Attach with
 * `SparkSession.builder().withExtensions(new GraftExtensions)` — done by
 * default in [[graft.GraftSession]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => {
        require(exprs.length == 2, "dot_product(arrayA, arrayB) takes 2 arguments")
        DotProduct(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "ngram_hashes"),
      exprs => {
        require(exprs.length == 2, "ngram_hashes(tokens, n) takes 2 arguments")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"ngram_hashes n must be an integer literal, got $other")
        }
        NgramHashes(exprs.head, n)
      }))
    e.injectFunction((
      FunctionIdentifier("quantize_i8"),
      new ExpressionInfo(classOf[QuantizeI8].getName, "quantize_i8"),
      exprs => {
        require(exprs.length == 1, "quantize_i8(vector) takes 1 argument")
        QuantizeI8(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      exprs => {
        require(exprs.nonEmpty && exprs.length <= 2,
          "rolling_hash(tokens[, portable]) takes 1-2 arguments")
        val portable = exprs.lift(1).exists {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Boolean, _) => v
          case other => throw new IllegalArgumentException(
            s"rolling_hash portable flag must be a boolean literal, got $other")
        }
        RollingHash(exprs.head, portable)
      }))
    e.injectFunction((
      FunctionIdentifier("minhash_signature"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      exprs => {
        require(exprs.length == 2, "minhash_signature(hashes, numPerm) takes 2 arguments")
        val n = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature numPerm must be an integer literal, got $other")
        }
        MinHashSignature(exprs.head, n)
      }))
    e.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      exprs => {
        require(exprs.length == 1, "simhash64(tokens) takes 1 argument")
        SimHash64(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("char_histogram"),
      new ExpressionInfo(classOf[CharHistogram].getName, "char_histogram"),
      exprs => {
        require(exprs.length == 1, "char_histogram(text) takes 1 argument")
        CharHistogram(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("l1_distance"),
      new ExpressionInfo(classOf[L1Distance].getName, "l1_distance"),
      exprs => {
        require(exprs.length == 2, "l1_distance(histA, histB) takes 2 arguments")
        L1Distance(exprs.head, exprs(1))
      }))
    e.injectFunction((
      FunctionIdentifier("count_min_build"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min_build"),
      exprs => {
        require(exprs.length == 1 || exprs.length == 4,
          "count_min_build(item[, depth, width, seed]) takes 1 or 4 arguments")
        def intLit(i: Int, what: String): Int = exprs(i) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"count_min_build $what must be an integer literal, got $other")
        }
        if (exprs.length == 1) CountMinAgg(exprs.head, 5, 2048, 42).toAggregateExpression()
        else CountMinAgg(exprs.head, intLit(1, "depth"), intLit(2, "width"),
          intLit(3, "seed")).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("count_min_merge"),
      new ExpressionInfo(classOf[CountMinMergeAgg].getName, "count_min_merge"),
      exprs => {
        require(exprs.length == 1, "count_min_merge(sketch) takes 1 argument")
        CountMinMergeAgg(exprs.head).toAggregateExpression()
      }))
    e.injectFunction((
      FunctionIdentifier("count_min_query"),
      new ExpressionInfo(classOf[CountMinQuery].getName, "count_min_query"),
      exprs => {
        require(exprs.length == 2, "count_min_query(sketch, item) takes 2 arguments")
        CountMinQuery(exprs.head, exprs(1))
      }))
    // media container codecs — the multi-arg encoders take one struct
    // child, so the SQL shims pack the argument list for the caller
    e.injectFunction((
      FunctionIdentifier("image_bytes"),
      new ExpressionInfo(classOf[ImageBytes].getName, "image_bytes"),
      exprs => {
        require(exprs.length == 5,
          "image_bytes(kind, width, height, depth, pad) takes 5 arguments")
        ImageBytes(org.apache.spark.sql.catalyst.expressions.CreateStruct(exprs))
      }))
    e.injectFunction((
      FunctionIdentifier("image_meta"),
      new ExpressionInfo(classOf[ImageMeta].getName, "image_meta"),
      exprs => {
        require(exprs.length == 1, "image_meta(bytes) takes 1 argument")
        ImageMeta(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("audio_bytes"),
      new ExpressionInfo(classOf[AudioBytes].getName, "audio_bytes"),
      exprs => {
        require(exprs.length == 5,
          "audio_bytes(sample_rate, channels, bits, n_samples, pad) takes 5 arguments")
        AudioBytes(org.apache.spark.sql.catalyst.expressions.CreateStruct(exprs))
      }))
    e.injectFunction((
      FunctionIdentifier("audio_meta"),
      new ExpressionInfo(classOf[AudioMeta].getName, "audio_meta"),
      exprs => {
        require(exprs.length == 1, "audio_meta(bytes) takes 1 argument")
        AudioMeta(exprs.head)
      }))
    e.injectFunction((
      FunctionIdentifier("video_bytes"),
      new ExpressionInfo(classOf[VideoBytes].getName, "video_bytes"),
      exprs => {
        require(exprs.length == 3,
          "video_bytes(timescale, duration, pad) takes 3 arguments")
        VideoBytes(org.apache.spark.sql.catalyst.expressions.CreateStruct(exprs))
      }))
    e.injectFunction((
      FunctionIdentifier("video_meta"),
      new ExpressionInfo(classOf[VideoMeta].getName, "video_meta"),
      exprs => {
        require(exprs.length == 1, "video_meta(bytes) takes 1 argument")
        VideoMeta(exprs.head)
      }))
  }
}
