package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{graftbridge => bridge}

/**
 * B21 — Bloom-prefiltered semi join: filter a huge fact table down to an
 * audience/key set with a broadcast Bloom filter BEFORE the shuffle, then
 * finish with the exact semi join.
 *
 * The reference's audience/key-set filtering replays per-row key lookups
 * against the state store (connectors keep "last synced keys" and filter
 * row-at-a-time). The relational form is a semi join — but at 100 TB a
 * plain semi join shuffles the ENTIRE fact side on the key. A Bloom
 * filter of the dim keys (a few MB for tens of millions of keys at ~1%
 * FPR) rides to every task as one constant, and the shuffle then carries
 * only probable members: |matches| + |FPR x fact|, not |fact|. False
 * positives are removed by the real join, so the result is EXACTLY the
 * plain semi join — the q66 oracle replays it as ANSI EXISTS.
 *
 * Uses Spark's own runtime-filter machinery (BloomFilterAggregate /
 * BloomFilterMightContain over xxhash64-ed keys) rather than a re-im-
 * plementation; AQE injects the same shape for its runtime filters, but
 * only when dim statistics happen to trigger it — this operator makes
 * the pattern deliberate and composable with the sync pipeline.
 */
object BloomJoin {

  /** Bloom filter over `dim`'s (xxhash64-ed) keys as one binary blob.
    * `numBits` sizes the filter: ~10 bits/key gives ~1% FPR. Returns null
    * when `dim` is empty. */
  def buildBloom(dim: DataFrame, keyCol: String,
                 expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = bridge.column(
      new BloomFilterAggregate(bridge.expression(xxhash64(col(keyCol))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    dim.agg(agg.as("bf")).collect()(0).getAs[Array[Byte]]("bf")
  }

  /** Membership probe of a key column against a built filter. */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), bridge.expression(xxhash64(key))))

  /** Exact semi join of `fact` against `dim`'s key set, with the fact side
    * Bloom-prefiltered before the shuffle. Result is identical to
    * `fact.join(dim, fact(factKey) === dim(dimKey), "left_semi")`. */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame,
                    factKey: String, dimKey: String,
                    expectedItems: Long = 1000000L,
                    numBits: Long = 8388608L): DataFrame = {
    val bytes = buildBloom(dim, dimKey, expectedItems, numBits)
    if (bytes == null) fact.filter(lit(false)) // empty dim -> empty semi join
    else {
      val keys = dim.select(col(dimKey).as("__bloom_key")).distinct()
      fact.filter(mightContain(bytes, col(factKey)))
        .join(keys, col(factKey) === col("__bloom_key"), "left_semi")
    }
  }
}
