package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level text helpers — all codegen'd built-ins, no UDFs, so
  * every derived column stays inside whole-stage codegen. */
object TextOps {

  /** Whitespace tokens of a single-space-separated text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles; texts shorter than n words fall back to
    * one whole-text shingle so no document drops out of dedup. */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(array_distinct(
        transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n))))))

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Deterministic per-permutation hash of one shingle: xxhash64 seeded by
    * mixing the permutation index into the input (public-API equivalent of
    * k independent hash functions). */
  def permHash(shingle: Column, perm: Column): Column = xxhash64(shingle, perm)
}
