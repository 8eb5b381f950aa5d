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
  }
}
