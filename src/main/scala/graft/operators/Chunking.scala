package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.tokens

/**
 * §2C context-window preparation — the two operators that turn a cleaned
 * corpus into model-ready sequences:
 *
 *  - [[chunkByTokens]]: split each document into overlapping fixed-token
 *    windows (retrieval / embedding indexing shape);
 *  - [[packContextWindows]]: concatenate documents in stable id order and
 *    cut the stream into fixed token budgets (pretraining packing shape).
 *
 * Both are deterministic integer arithmetic end to end, so the DuckDB
 * oracle replays every assignment exactly.
 */
object Chunking {

  /** C32: overlapping token-window chunking. Each document with n tokens
    * yields `1 + max(0, ceil((n - window) / stride))` chunks at starts
    * 0, stride, 2·stride, …— the closed-form count, so there is NO
    * filter-HOF pruning of a generated start list (higher-order
    * functions are interpreted; this stays whole-stage codegen'd. The
    * formula also never emits a tail chunk the previous window already
    * covered.) Chunks keep (doc_id, chunk_idx, n_tokens, chunk_hash):
    * the hash stands in for chunk text so the result stays narrow;
    * callers wanting the text select `chunk_text` before the drop.
    *
    * Scale: explode fan-out is ~n/stride per doc — output-proportional,
    * the right asymptote; no shuffle until whatever follows. */
  def chunkByTokens(docs: DataFrame, window: Int, stride: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      "need 1 <= stride <= window (stride > window would drop tokens)")
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      // closed-form chunk count: ceil((n - window)/stride) + 1 for n > window
      .withColumn("__nc",
        when(col("__n") <= window, lit(1L))
          .otherwise(ceil((col("__n") - lit(window)).cast("double") / lit(stride))
            .cast("long") + lit(1L)))
    base
      .select(col(idCol), col("__toks"), col("__n"),
        posexplode(sequence(lit(0L), (col("__nc") - 1) * lit(stride), lit(stride.toLong)))
          .as(Seq("chunk_idx", "__start")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("__start").cast("int") + 1, lit(window)))
          .as("chunk_text"),
        least(col("__n") - col("__start"), lit(window.toLong)).as("n_tokens"))
      .select(col(idCol), col("chunk_idx"), col("n_tokens"),
        md5(col("chunk_text")).as("chunk_hash"))
  }

  /** Non-overlapping fixed-token segmentation — the "line" provider for
    * corpora without newlines (this repo's test corpus): each document
    * yields ceil(n/width) segments of `width` tokens (last one shorter),
    * as (id, line_idx, line) rows. Same closed-form posexplode(sequence)
    * shape as [[chunkByTokens]] (window = stride = width, text retained),
    * so it stays whole-stage codegen'd with output-proportional fan-out. */
  def tokenLines(docs: DataFrame, width: Int,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(width >= 1)
    docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__nc", ceil(col("__n").cast("double") / lit(width)).cast("long"))
      .select(col(idCol),
        posexplode(sequence(lit(0L), (col("__nc") - 1) * lit(width), lit(width.toLong)))
          .as(Seq("line_idx", "__start")),
        col("__toks"))
      .select(col(idCol), col("line_idx").cast("long").as("line_idx"),
        concat_ws(" ", slice(col("__toks"), col("__start").cast("int") + 1, lit(width)))
          .as("line"))
  }

  /** C33: pretraining sequence packing — documents are concatenated in
    * stable ascending-id order into one token stream, and the stream is
    * cut into fixed `budget`-token context windows. Each document learns
    * the window its FIRST token falls into and its offset inside that
    * window (a doc may straddle windows; the assignment is where it
    * starts, which is all the writer needs to lay the stream out).
    *
    * Scale: this is a GLOBAL prefix sum, which a naive
    * `Window.orderBy(id)` computes on ONE task. Here it is the classic
    * two-level distributed scan, exactly equal to the global form:
    *   1. local cumulative sums within `blockSize`-wide id blocks
    *      (window partitioned by block — parallel);
    *   2. per-block totals, cumulated across blocks (tiny: #blocks =
    *      idRange/blockSize rows — the ONLY single-task step, on KBs);
    *   3. broadcast block offsets back; global prefix = offset + local.
    * At 10^12 docs with blockSize 10^6 the block table is 10^6 rows —
    * still driver-light; recurse the same trick if it ever isn't. */
  def packContextWindows(docs: DataFrame, budget: Long, blockSize: Long = 4096L,
                         idCol: String = "doc_id", tokCountCol: String = "n_tokens"): DataFrame = {
    require(budget >= 1 && blockSize >= 1)
    val base = docs.select(col(idCol), col(tokCountCol).cast("long").as("__tok"))
      .withColumn("__blk", expr(s"$idCol div $blockSize"))
    val wLocal = Window.partitionBy("__blk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("__cum_local", sum(col("__tok")).over(wLocal))
    // block totals, then exclusive running offset across blocks (tiny set)
    val wBlocks = Window.orderBy("__blk")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy("__blk").agg(sum(col("__tok")).as("__blk_tot"))
      .withColumn("__off", sum(col("__blk_tot")).over(wBlocks) - col("__blk_tot"))
      .select("__blk", "__off")
    local.join(broadcast(offsets), "__blk")
      .withColumn("__prefix", col("__off") + col("__cum_local") - col("__tok"))
      .select(col(idCol), col("__tok").as("n_tokens"),
        expr("__prefix div " + budget).as("window_id"),
        (col("__prefix") % budget).as("window_offset"))
  }

  /** C79: sequence-PADDING waste audit — the batching-efficiency report
    * of variable-length training (every sequence in a batch pads to the
    * batch's cap; the padding share is pure wasted compute, and at 100 TB
    * the waste IS a budget line): documents land in fixed length buckets
    * (a codegen'd comparison chain over `caps` — no float log at power-
    * of-two boundaries), and each bucket reports sequences, real tokens,
    * and the fixed-point waste under BOTH padding policies — pad-to-cap
    * (static shapes, XLA-style) and pad-to-longest-in-bucket (dynamic
    * batches). The two columns side by side are the decision the audit
    * exists for. Sequences beyond the last cap land in an overflow
    * bucket capped by their own max (they'd be split upstream by C32).
    *
    * Scale: one scan, map-side partial aggregation to ≤ |caps|+1 rows. */
  def paddingAudit(docs: DataFrame, caps: Seq[Int] = Seq(16, 32, 64, 128, 256, 512),
                   tokCountCol: String = "n_tokens"): DataFrame = {
    require(caps.nonEmpty && caps == caps.sorted && caps.distinct == caps,
      "caps: sorted, distinct, non-empty")
    val n = col(tokCountCol).cast("long")
    val cap = caps.foldRight(lit(Long.MaxValue)) { (c, acc) =>
      when(n <= c, c.toLong).otherwise(acc)
    }
    docs.select(n.as("n"), cap.as("cap"))
      .groupBy("cap").agg(
        count(lit(1)).as("n_seqs"),
        sum(col("n")).as("sum_tokens"),
        max(col("n")).as("max_len"))
      // only the OVERFLOW bucket caps to its own longest member; real
      // buckets keep their fixed cap (that's what "static shapes" means)
      .withColumn("cap",
        when(col("cap") === Long.MaxValue, col("max_len")).otherwise(col("cap")))
      .withColumn("padded_static", col("n_seqs") * col("cap"))
      .withColumn("padded_dynamic", col("n_seqs") * col("max_len"))
      .withColumn("waste_static_fp",
        expr("(padded_static - sum_tokens) * 1000000 div padded_static"))
      .withColumn("waste_dynamic_fp",
        expr("(padded_dynamic - sum_tokens) * 1000000 div padded_dynamic"))
  }

  /** C73: CONTENT-DEFINED chunking + chunk-level dedup profile — the
    * insertion-stable complement of [[chunkByTokens]] (the storage-dedup
    * recipe — Rabin/gear CDC, LBFS Muthitacharoen et al. 2001 — applied
    * to token streams): a chunk boundary falls after token p whenever the
    * rolling window hash of the `w` tokens ENDING at p lands in a fixed
    * residue class (`hash % divisor == divisor-1`, expected chunk length
    * ≈ `divisor` tokens). Because the cut decision depends only on a
    * local window — never on where the previous cut fell — an edit
    * anywhere in a document moves only the boundaries within `w` tokens
    * of the edit, and every other chunk re-hashes identically. That is
    * the property that makes chunk-level dedup robust to the
    * insert-one-sentence near-duplicates that defeat fixed-width
    * chunking (C32), at the cost of variable chunk sizes.
    *
    * Window hashes are the portable 31-bit shingle hashes
    * ([[graft.functions.SignatureFunctions.allShingleHashes]]), so a
    * replaying engine reproduces every boundary. Docs shorter than `w`
    * hash one window over all tokens; its cut position lies at/past the
    * last token and is a no-op, so short docs form one whole-doc chunk.
    *
    * Scale: one corpus scan computes all window hashes (codegen'd, no
    * HOF); cut flags are output-proportional; chunk assignment is a
    * per-document running count (partition = one doc); chunk hashing is
    * the line-dedup family's output-proportional sort_array rebuild per
    * (doc, chunk); the only corpus-wide shuffle is the chunk-hash
    * occurrence count (map-side partial). No pairwise construct.
    *
    * Output per doc: (doc_id, n_tokens, n_chunks, n_dup_chunks,
    * dup_tokens, avg_chunk_tokens_fp, dup_token_ratio_fp) — fixed-point
    * ×10^6 floor-division ratios, integer-exact on any engine. A chunk
    * occurrence is DUPLICATED iff its content hash occurs ≥2 times
    * corpus-wide (any document, including its own). */
  def cdcChunkProfile(docs: DataFrame, w: Int = 4, divisor: Int = 8,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 1 && divisor >= 2, "need window >= 1 and divisor >= 2")
    import graft.functions.SignatureFunctions.allShingleHashes
    val toks = docs.select(col(idCol).as("id"), tokens(col(textCol)).as("t"))
      .withColumn("hs", allShingleHashes(col("t"), w))
    // a window STARTING at s covers [s, s+w-1]; its cut falls after s+w-1
    val cuts = toks.select(col("id"), posexplode(col("hs")).as(Seq("s", "h")))
      .filter(col("h") % divisor === divisor - 1)
      .select(col("id"), (col("s") + (w - 1)).cast("long").as("idx"),
        lit(1L).as("is_cut"))
    val tokenRows = toks.select(col("id"), posexplode(col("t")).as(Seq("idx", "tok")))
      .withColumn("idx", col("idx").cast("long"))
    // chunk id = number of cuts strictly BEFORE this token's position
    val wCuts = Window.partitionBy("id").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val assigned = tokenRows.join(cuts, Seq("id", "idx"), "left_outer")
      .withColumn("chunk", coalesce(sum(col("is_cut")).over(wCuts), lit(0L)))
    val chunks = assigned.groupBy("id", "chunk").agg(
      count(lit(1)).as("c_tokens"),
      md5(concat_ws(" ",
        sort_array(collect_list(struct(col("idx"), col("tok")))).getField("tok")))
        .as("ch"))
    val occ = chunks.groupBy("ch").agg(count(lit(1)).as("occs"))
    chunks.join(occ, "ch")
      .groupBy("id").agg(
        sum(col("c_tokens")).as("n_tokens"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("occs") >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("occs") >= 2, col("c_tokens")).otherwise(0L)).as("dup_tokens"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_chunks"),
        col("n_dup_chunks"), col("dup_tokens"),
        expr("n_tokens * 1000000 div n_chunks").as("avg_chunk_tokens_fp"),
        expr("dup_tokens * 1000000 div n_tokens").as("dup_token_ratio_fp"))
  }

  /** C60: deterministic training-SHARD layout — the output stage of a
    * data pipeline: globally SHUFFLE the corpus (portable md5 rank hash,
    * so the "random" order is reproducible run-over-run and replayable by
    * any engine — never an RNG) and pack documents, in shuffled order,
    * into ~`shardTokens`-token output shards. Shard id = exclusive token
    * prefix div budget; pos_in_shard numbers a shard's documents in write
    * order, so a writer task can stream shard s directly.
    *
    * Scale: the same two-level prefix-scan shape as
    * [[packContextWindows]], but ordered by the HASH — buckets are the
    * hash's high bits (2^16 of them), each bucket's window is parallel,
    * and only the bucket-total frame (≤ 65k rows at ANY corpus size)
    * crosses a single-task window. The per-shard pos window partitions by
    * shard_id — partition size ≤ shardTokens/min_doc_tokens, bounded by
    * construction. */
  def shardLayout(docs: DataFrame, shardTokens: Long,
                  idCol: String = "doc_id", tokCountCol: String = "n_tokens"): DataFrame = {
    require(shardTokens >= 1)
    val base = docs.select(col(idCol), col(tokCountCol).cast("long").as("__tok"))
      .withColumn("__k", Sampling.rankHash(col(idCol)))      // 60-bit portable hash
      .withColumn("__bkt", expr(s"__k div ${1L << 44}"))     // high 16 bits → ordered buckets
    val wLocal = Window.partitionBy("__bkt").orderBy(col("__k"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBuckets = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = base.groupBy("__bkt").agg(sum(col("__tok")).as("__tot"))
      .withColumn("__off", sum(col("__tot")).over(wBuckets) - col("__tot"))
      .select("__bkt", "__off")
    val placed = base
      .withColumn("__cum_local", sum(col("__tok")).over(wLocal))
      .join(broadcast(offsets), "__bkt")
      .withColumn("__prefix", col("__off") + col("__cum_local") - col("__tok"))
      .withColumn("shard_id", expr(s"__prefix div $shardTokens"))
    val wShard = Window.partitionBy("shard_id").orderBy(col("__k"), col(idCol))
    placed.select(col(idCol), col("__tok").as("n_tokens"), col("shard_id"),
      row_number().over(wShard).cast("long").as("pos_in_shard"))
  }
}
