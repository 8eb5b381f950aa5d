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
  }
}
