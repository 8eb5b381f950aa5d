package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared column-level text helpers — all codegen'd built-ins, no UDFs, so
  * every derived column stays inside whole-stage codegen. */
object TextOps {

  /** Whitespace tokens of a single-space-separated text column. */
  def tokens(text: Column): Column = split(text, " ")

  // n-gram shingling lives in graft.functions.NgramHashes (native codegen'd
  // expression); the composable transform/slice/concat_ws form it replaced
  // was interpreted and dominated the dedup hot path.

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // per-permutation shingle hashing lives INSIDE graft.functions
  // .MinHashSignature now (hash-compatible with the xxhash64(h, p) column
  // form it replaced): the signature is a per-row kernel, so no column-
  // level permutation hash is exposed anymore.
}
