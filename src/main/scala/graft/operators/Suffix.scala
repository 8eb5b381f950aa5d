package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C62 — exact DUPLICATED-SPAN profiling via distributed suffix ordering.
 *
 * The exact-substring member of the dedup family: for every token
 * position, the length of the longest token span starting there that
 * also occurs ANYWHERE else in the corpus (same or another document) —
 * the per-position signal behind suffix-array substring dedup
 * (the "dedup by suffix array" recipe of modern LLM corpus curation;
 * the fixed-n span coverage C36 approximates this with one n).
 *
 * Spark-first construction, no suffix ARRAYS materialized:
 *
 *  1. tokens → portable md5 31-bit hash per position (engine-replayable);
 *  2. PREFIX DOUBLING over (doc-local) suffixes: after round k every
 *     suffix carries a dense rank that orders suffixes by their first
 *     2^k tokens; one rank-pair join + one distributed dense-rank per
 *     round, log2(max doc tokens) rounds, lineage cut per round. Dense
 *     ranking is the two-level scan: range-repartition the distinct
 *     pairs, per-partition row_number, tiny per-partition offset frame
 *     (numPartitions rows) broadcast back — no global window.
 *  3. Suffixes sharing a final rank are IDENTICAL whole suffixes (dup
 *     length = full tail). For the rest, the nearest neighbor in rank
 *     order bounds every other suffix's common prefix (sorted-order
 *     property), so per RANK one representative joins the next rank's
 *     representative and a codegen'd [[graft.functions.CommonPrefixLen]]
 *     scans the two token tails — O(answer) work per adjacent pair,
 *     tails shipped only for the adjacent-pair frame.
 *
 * Scale: every step is a key-equality shuffle (rank pairs, rank
 * adjacency, doc join); the only sub-linear frames are the per-round
 * partition-offset tables. At 100 TB the doubling rounds dominate —
 * O(log maxDocLen) passes over (doc, pos, rank) triples, the published
 * asymptote for distributed suffix ranking (prefix doubling /
 * Larsson–Sadakane applied corpus-wide).
 */
object Suffix {

  /** Distributed dense rank of (c1, c2) pairs → (c1, c2, rank), rank in
    * [0, #distinct). Two-level: range-partitioned local row_numbers plus
    * a broadcast offset frame of `parts` rows. */
  private def denseRankPairs(pairs: DataFrame, parts: Int): DataFrame = {
    val keys = pairs.select("r1", "r2").distinct()
      .repartitionByRange(parts, col("r1"), col("r2"))
      .withColumn("__pid", spark_partition_id())
    val local = keys.withColumn("__lr",
      row_number().over(Window.partitionBy("__pid").orderBy(col("r1"), col("r2"))))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = local.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__off", sum(col("__n")).over(wOff) - col("__n"))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .select(col("r1"), col("r2"), (col("__off") + col("__lr") - 1).as("rank"))
  }

  /** Per-document duplicated-span profile:
    * (doc_id, n_tokens, max_dup_span, n_dup_positions) where
    * max_dup_span = longest span starting anywhere in the doc that
    * recurs elsewhere, and n_dup_positions counts positions whose
    * duplicated span is ≥ `minSpan` tokens. */
  def dupSpanProfile(docs: DataFrame, minSpan: Int = 8,
                     idCol: String = "doc_id", textCol: String = "text",
                     rankParts: Int = 32): DataFrame = {
    import graft.functions.SignatureFunctions.allShingleHashes
    import graft.functions.TextFunctions.commonPrefixLen

    val toks = docs.select(col(idCol).as("doc_id"),
        allShingleHashes(split(col(textCol), " "), 1).as("hs"))
      .localCheckpoint(eager = true)
    val positions = toks.select(col("doc_id"), posexplode(col("hs")).as(Seq("pos", "h")))

    val maxLen = toks.agg(max(size(col("hs")))).head().getInt(0).toLong
    val nSuffix = positions.count()

    // round 0: rank by the first token alone
    var cur = positions.withColumn("r1", col("h")).withColumn("r2", lit(-1L))
    var ranked = cur.join(denseRankPairs(cur, rankParts), Seq("r1", "r2"))
      .select(col("doc_id"), col("pos"), col("rank").as("r"))
      .localCheckpoint(eager = true)
    var span = 1L
    var distinctRanks = ranked.agg(max(col("r"))).head().getLong(0) + 1
    while (span < maxLen && distinctRanks < nSuffix) {
      val shifted = ranked.select(col("doc_id"), (col("pos") - span).as("pos"),
        col("r").as("r2"))
      val paired = ranked.withColumnRenamed("r", "r1")
        .join(shifted, Seq("doc_id", "pos"), "left_outer")
        .na.fill(-1L, Seq("r2")) // tail shorter than 2*span: sorts before any real rank
      val next = paired.join(denseRankPairs(paired, rankParts), Seq("r1", "r2"))
        .select(col("doc_id"), col("pos"), col("rank").as("r"))
        .localCheckpoint(eager = true)
      ranked.unpersist(blocking = false)
      ranked = next
      span *= 2
      distinctRanks = ranked.agg(max(col("r"))).head().getLong(0) + 1
    }

    // one representative (min doc, pos) + multiplicity per final rank
    val reps = ranked.groupBy("r")
      .agg(min(struct(col("doc_id"), col("pos"))).as("rep"), count(lit(1)).as("mult"))
      .select(col("r"), col("rep.doc_id").as("doc_id"), col("rep.pos").as("pos"),
        col("mult"))
    // LCP between rank k's representative and rank k+1's — tails compared
    // directly by the codegen'd kernel (slice ships only adjacent pairs)
    def tail(dfCol: String, posCol: String) =
      expr(s"slice($dfCol, $posCol + 1, size($dfCol))")
    val upNbr = reps.select((col("r") - 1).as("r"),
      col("doc_id").as("doc_b"), col("pos").as("pos_b"))
    val lcpUp = reps.join(upNbr, Seq("r"))
      .join(toks.select(col("doc_id"), col("hs").as("hs_a")), "doc_id")
      .join(toks.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .select(col("r"),
        commonPrefixLen(tail("hs_a", "pos"), tail("hs_b", "pos_b")).as("lcp_up"))

    val perRank = reps.select("r", "mult")
      .join(lcpUp, Seq("r"), "left_outer")
      .select(col("r"), col("mult"), coalesce(col("lcp_up"), lit(0L)).as("lcp_up"))
    val withDown = perRank
      .join(perRank.select((col("r") + 1).as("r"), col("lcp_up").as("lcp_down")),
        Seq("r"), "left_outer")
      .na.fill(0L, Seq("lcp_down"))

    val scored = ranked.join(toks.select(col("doc_id"), size(col("hs")).as("n_tokens")), "doc_id")
      .join(withDown, "r")
      .withColumn("dup_len", greatest(
        col("lcp_up"), col("lcp_down"),
        when(col("mult") > 1, col("n_tokens").cast("long") - col("pos")).otherwise(0L)))

    // NOTE: toks/ranked stay checkpointed — the returned plan still reads
    // them; the ContextCleaner reclaims the blocks when the frame dies.
    scored.groupBy("doc_id")
      .agg(first(col("n_tokens")).cast("long").as("n_tokens"),
        max(col("dup_len")).as("max_dup_span"),
        sum(when(col("dup_len") >= minSpan, 1L).otherwise(0L)).as("n_dup_positions"))
  }
}
