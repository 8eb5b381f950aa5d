package graft.operators

import graft.operators.Lineage.LineageOps
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
 *  2. PREFIX DOUBLING with Larsson–Sadakane RETIREMENT over (doc-local)
 *     suffixes. Ranks are GROUP-START ranks: rank = number of suffixes
 *     sorted strictly before this suffix's group, so the groups always
 *     partition [0, N) into contiguous intervals [r, r + mult). After
 *     round k the rank orders suffixes by their first 2^k tokens. A
 *     group of mult 1 is RESOLVED — its rank is final and the position
 *     retires from the working frame; each round re-ranks ONLY the
 *     active (mult > 1) positions, and a split keeps every subgroup
 *     inside the parent's interval (new rank = parent rank + #active
 *     siblings ordered before it), so retired ranks stay globally
 *     comparable without renumbering. One rank-pair join + one
 *     interval-split per round, ≤ log2(max doc tokens) rounds, with a
 *     FIXED-POINT exit: a round where no group splits proves no future
 *     round can split either (ranks only move when a split moves them),
 *     so the loop stops as soon as only exact-duplicate suffix classes
 *     remain. Rank assignment is the two-level scan: range-repartition
 *     the distinct pairs, per-partition running count, tiny
 *     per-partition offset frame broadcast back — no global window.
 *  3. Suffixes sharing a final rank are IDENTICAL whole suffixes (dup
 *     length = full tail). For the rest, the nearest neighbor in rank
 *     order bounds every other suffix's common prefix (sorted-order
 *     property), so per GROUP one representative joins the successor
 *     group's representative (start r + mult — intervals make adjacency
 *     arithmetic) and a codegen'd [[graft.functions.CommonPrefixLen]]
 *     scans the two token tails — O(answer) work per adjacent pair,
 *     tails shipped only for the adjacent-pair frame.
 *
 * Scale: every step is a key-equality shuffle (rank pairs, rank
 * adjacency, doc join); the only sub-linear frames are the per-round
 * partition-offset tables. At 100 TB the doubling rounds dominate —
 * O(log maxDocLen) passes, but after retirement each pass pairs and
 * re-ranks only the still-ambiguous positions (natural text resolves
 * most suffixes within a few rounds), and the full frame is touched
 * only for the rank lookup at pos+span and the per-round checkpoint.
 */
object Suffix {

  /** Distributed GROUP-START rank of (r1, r2) pairs →
    * (r1, r2, rank, mult): rank = number of pair-ROWS sorted strictly
    * before this pair (exclusive running count of group sizes in
    * (r1, r2) order), mult = rows carrying the pair. Two-level: range-
    * partitioned local running sums plus a broadcast offset frame of
    * `parts` rows — no global window. */
  private def groupStartRanks(pairs: DataFrame, parts: Int): DataFrame = {
    val keys = pairs.groupBy("r1", "r2").agg(count(lit(1)).as("mult"))
      .repartitionByRange(parts, col("r1"), col("r2"))
      .withColumn("__pid", spark_partition_id())
    val wLoc = Window.partitionBy("__pid").orderBy(col("r1"), col("r2"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = keys.withColumn("__cum", sum(col("mult")).over(wLoc) - col("mult"))
    val wOff = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = local.groupBy("__pid").agg(sum(col("mult")).as("__n"))
      .withColumn("__off", sum(col("__n")).over(wOff) - col("__n"))
      .select("__pid", "__off")
    local.join(broadcast(offsets), "__pid")
      .select(col("r1"), col("r2"),
        (col("__off") + col("__cum")).as("rank"), col("mult"))
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
      .cut()

    val maxLen = toks.agg(max(size(col("hs")))).head().getInt(0).toLong

    // round 0: group-start rank by the first FOUR tokens at once — two
    // 63-bit composite keys (hash_i·2^32 + hash_{i+1}+1; 0 encodes "tail
    // ended", so shorter suffixes sort first exactly as in plain suffix
    // order) seed the loop at span 4, skipping the two all-positions
    // doubling rounds that dominate the cost. Composites are built as an
    // array BEFORE the explode (explode-then-index would duplicate the
    // token array per position — O(len²) bytes per doc). This is the one
    // round that needs a GLOBAL order, so it uses the skew-proof
    // two-level scan.
    val B = 4294967296L // 2^32; token hashes are 31-bit non-negative
    val seeded = toks.select(col("doc_id"), expr(
      s"""transform(sequence(0, size(hs) - 1), i -> named_struct(
         |  'r1', cast(hs[i] as bigint) * ${B}L +
         |        if(i + 1 < size(hs), cast(hs[i + 1] as bigint) + 1L, 0L),
         |  'r2', if(i + 2 < size(hs),
         |        cast(hs[i + 2] as bigint) * ${B}L +
         |        if(i + 3 < size(hs), cast(hs[i + 3] as bigint) + 1L, 0L), -1L)))
         |""".stripMargin).as("seed"))
      .select(col("doc_id"), posexplode(col("seed")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), col("s.r1").as("r1"), col("s.r2").as("r2"))
    val r0 = groupStartRanks(seeded.select("r1", "r2"), rankParts)
    val rankCols = Seq("doc_id", "pos", "r", "mult").map(col)
    val round0 = seeded
      .join(r0, Seq("r1", "r2"))
      .select(col("doc_id"), col("pos"), col("rank").as("r"), col("mult"))
      .cut()
    // resolved (mult == 1) ranks are FINAL — those positions retire; only
    // the active remainder is re-paired, re-ranked and re-checkpointed
    // each round. All frames here are views over already-materialized
    // checkpoints, so the unions below are scans, not recomputation.
    // A round that resolves NOTHING must not cons a frame: each retired
    // frame is re-scanned by every later round's rank lookup, so on a
    // dup-saturated corpus (no suffix ever unique) accumulating empty
    // filters costs O(rounds²) full-frame scans for zero rows — measured
    // 70 s vs 43 s at the 16× saturated probe before this guard.
    val st0 = round0.agg(max(col("mult")),
      sum(when(col("mult") === 1, 1L).otherwise(0L))).head()
    var resolved =
      if (st0.getLong(1) > 0L) List(round0.filter(col("mult") === 1).select(rankCols: _*))
      else Nil
    var active = round0.filter(col("mult") > 1).select(rankCols: _*)
    var done = st0.getLong(0) <= 1L
    var span = 4L
    while (span < maxLen && !done) {
      // pair ONLY the active positions with the rank 2*span ahead; the
      // retired frames are consulted just for that rank lookup (the
      // suffix at pos+span may itself already be retired)
      val all = (active :: resolved).reduce(_ unionByName _)
      val shifted = all.select(col("doc_id"), (col("pos") - span).as("pos"),
        col("r").as("r2"))
      val paired = active.select(col("doc_id"), col("pos"), col("r").as("r1"))
        .join(shifted, Seq("doc_id", "pos"), "left_outer")
        .na.fill(-1L, Seq("r2")) // tail shorter than 2*span: sorts before any real rank
      // split each parent interval [r1, r1+mult) among its subgroups:
      // child start = parent start + active siblings ordered before it.
      // Within-parent order only — a window partitioned by r1, not a
      // global sort (partition size is bounded by the parent group's
      // DISTINCT continuations at depth `span`, which the next doubling
      // halves; round 0 already handled the one genuinely global order).
      val wCum = Window.partitionBy("r1").orderBy("r2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val keys = paired.groupBy("r1", "r2").agg(count(lit(1)).as("mult"))
        .withColumn("__cum", sum(col("mult")).over(wCum) - col("mult"))
        .withColumn("__siblings", count(lit(1)).over(Window.partitionBy("r1")))
      // ONE job materializes the round: ReuseExchange computes `paired`
      // once for both the groupBy and the rank-assignment join
      val upd = paired.join(keys, Seq("r1", "r2"))
        .select(col("doc_id"), col("pos"), (col("r1") + col("__cum")).as("r"),
          col("mult"), col("__siblings"))
        .cut()
      // one trivial scan decides both exits: no parent with ≥2 subgroups
      // ⇒ FIXED POINT (ranks did not move and no future round can move
      // them — every surviving group is an identical-whole-suffix class);
      // max(mult) ⇒ whether any ambiguity is left at all; the resolved
      // row count gates the frame cons (see round-0 note)
      val st = upd.agg(max(col("mult")), max(col("__siblings")),
        sum(when(col("mult") === 1, 1L).otherwise(0L))).head()
      if (st.getLong(1) <= 1L) {
        done = true // upd ≡ active (no split ⇒ every rank unchanged); drop it
      } else {
        if (st.getLong(2) > 0L)
          resolved = upd.filter(col("mult") === 1).select(rankCols: _*) :: resolved
        active = upd.filter(col("mult") > 1).select(rankCols: _*)
        span *= 2
        done = st.getLong(0) <= 1L
      }
      // NOTE: prior-round checkpoints stay pinned — the retired frames
      // filter over them; total footprint is a geometric series over the
      // shrinking active set, and the ContextCleaner reclaims the blocks
      // when the returned frame dies.
    }
    val ranked = (active :: resolved).reduce(_ unionByName _)

    // one representative (min doc, pos) per final group; interval ranks
    // make the successor group addressable as r + mult
    val reps = ranked.groupBy("r")
      .agg(min(struct(col("doc_id"), col("pos"))).as("rep"), max(col("mult")).as("mult"))
      .select(col("r"), col("rep.doc_id").as("doc_id"), col("rep.pos").as("pos"),
        col("mult"))
    // LCP between group g's representative and its successor group's —
    // tails compared directly by the codegen'd kernel (slice ships only
    // adjacent pairs)
    def tail(dfCol: String, posCol: String) =
      expr(s"slice($dfCol, $posCol + 1, size($dfCol))")
    val upNbr = reps.select(col("r").as("r_nbr"),
      col("doc_id").as("doc_b"), col("pos").as("pos_b"))
    val lcpUp = reps.withColumn("r_nbr", col("r") + col("mult"))
      .join(upNbr, Seq("r_nbr"))
      .join(toks.select(col("doc_id"), col("hs").as("hs_a")), "doc_id")
      .join(toks.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), "doc_b")
      .select(col("r"),
        commonPrefixLen(tail("hs_a", "pos"), tail("hs_b", "pos_b")).as("lcp_up"))

    val perRank = reps.select("r", "mult")
      .join(lcpUp, Seq("r"), "left_outer")
      .select(col("r"), col("mult"), coalesce(col("lcp_up"), lit(0L)).as("lcp_up"))
    val withDown = perRank
      .join(perRank.select((col("r") + col("mult")).as("r"), col("lcp_up").as("lcp_down")),
        Seq("r"), "left_outer")
      .na.fill(0L, Seq("lcp_down"))

    val scored = ranked.select("doc_id", "pos", "r")
      .join(toks.select(col("doc_id"), size(col("hs")).as("n_tokens")), "doc_id")
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
