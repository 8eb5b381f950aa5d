package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distinct-count sketches (Apache DataSketches HLL via Spark's built-in
 * `hll_sketch_agg` family).
 *
 * The 100 TB pattern is to keep the SKETCH, not the number: sketches are
 * mergeable partial state, so per-partition/per-day sketches roll up to
 * any coarser grouping without rescanning raw data — the same reason all
 * graft aggregations insist on map-side partial aggregation. Exact
 * `countDistinct` at that scale forces a full shuffle of every distinct
 * value; an HLL sketch is a few KB per group at ~2% error.
 */
object Sketches {

  private val U64 = "18446744073709551616" // 2^64 as decimal literal

  /** C127: KMV (k-minimum-values / bottom-k theta) distinct sketch rows
    * per slice — the SET-OPERATION completion of the sketch family (C16's
    * HLL unions but cannot intersect; C41's count-min counts occurrences,
    * not identity): keeping the k smallest distinct unsigned `xxhash64`
    * values of a slice supports cardinality (`(k−1)·2^64 div h_k`,
    * Bar-Yossef et al. 2002 / the DataSketches theta estimator), and —
    * because bottom-k sets are closed under union — JACCARD and
    * INTERSECTION estimates between any two slices from the sketches
    * alone, no rescan (Beyer et al. SIGMOD 2007).
    *
    * Everything is exact integer: hashes live in DECIMAL(38,0) unsigned
    * space (signed xxhash64 + 2^64 when negative — unsigned order), the
    * estimate is one integer division, so DuckDB replays the pipeline
    * value-for-value through the xx macro chain.
    *
    * Scale shape: distinct (slice, hash) → the C22 salted two-phase
    * smallest-k (per-(slice,salt) window prune to k, then per-slice
    * re-rank of ≤ salts·k survivors — no slice ever funnels its full
    * distinct set through one task). Sketch size is k rows per slice,
    * independent of corpus size — the artifact a real deployment
    * persists per ingest batch and merges by re-ranking.
    *
    * @return (slice, rk (1-based ascending), hu DECIMAL(38,0), n_kept,
    *         est) — n_kept < k ⟹ the slice's distinct count was < k and
    *         est is exact. */
  def kmvSketches(df: DataFrame, sliceCol: String, valueCol: String,
                  k: Int = 256, salts: Int = 16): DataFrame = {
    require(k >= 2 && salts >= 1)
    val hu = when(xxhash64(col(valueCol)) < 0,
        xxhash64(col(valueCol)).cast("decimal(38,0)") + expr(s"CAST($U64 AS DECIMAL(38,0))"))
      .otherwise(xxhash64(col(valueCol)).cast("decimal(38,0)"))
    kmvFromHashes(df.select(col(sliceCol).as("slice"), hu.as("hu")), k, salts)
  }

  /** The bottom-k kernel over already-hashed rows — shared by
    * [[kmvSketches]] and the streaming state merge (D33,
    * `streaming/EventStreams.kmvMaintenance`): bottom-k sets are closed
    * under union, so merging persisted sketch rows with a fresh batch's
    * rows and re-cutting through this SAME kernel yields exactly the
    * sketch of the union — the law the spec pins.
    *
    * @param hashed (slice, hu DECIMAL(38,0)) rows, duplicates allowed. */
  def kmvFromHashes(hashed: DataFrame, k: Int = 256, salts: Int = 16): DataFrame = {
    require(k >= 2 && salts >= 1)
    import org.apache.spark.sql.expressions.Window
    val ded = hashed.select("slice", "hu").distinct()
    // phase 1: prune inside (slice, salt) lanes — lane from an independent
    // hash of the value's hash so lanes are uncorrelated with magnitude
    val lane = pmod(xxhash64(col("hu").cast("string"), lit(7)), lit(salts.toLong))
    val p1 = ded.withColumn("__lane", lane)
      .withColumn("__r", row_number().over(
        Window.partitionBy("slice", "__lane").orderBy(col("hu").asc)))
      .filter(col("__r") <= k).drop("__r", "__lane")
    // phase 2: exact k smallest among ≤ salts·k survivors per slice
    val p2 = p1.withColumn("rk", row_number().over(
        Window.partitionBy("slice").orderBy(col("hu").asc)).cast("long"))
      .filter(col("rk") <= k)
    val kept = p2.groupBy("slice").agg(count(lit(1)).as("n_kept"), max("hu").as("h_max"))
      .withColumn("est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"CAST((${k - 1} * CAST($U64 AS DECIMAL(38,0))) div h_max AS BIGINT)")))
      .select("slice", "n_kept", "est")
    p2.join(broadcast(kept), "slice").select("slice", "rk", "hu", "n_kept", "est")
  }

  /** C127: pairwise set-operation estimates from KMV sketch rows — for
    * every slice pair a<b, merge the two bottom-k sets, keep the k
    * smallest of the union, and read off: union cardinality (the merged
    * sketch's own KMV estimate), Jaccard (fraction of the merged
    * bottom-k present in BOTH input sketches — the Beyer et al.
    * estimator, exact per-mille integers), and intersection
    * (jacc·union). Cost is O(P²·k) rows for P slices — sketch-sized,
    * never corpus-sized; the P² pair frame is the audit's own output
    * shape. When the merged union has fewer than k distinct hashes both
    * estimates are exact by construction. */
  def kmvPairs(sketches: DataFrame, k: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = sketches.select(col("slice"), col("hu"))
    val slices = sketches.select("slice").distinct()
    val pairs = slices.select(col("slice").as("sa"))
      .join(slices.select(col("slice").as("sb")), col("sa") < col("sb"))
    val left = pairs
      .join(rows.withColumnRenamed("slice", "sa"), "sa")
      .select(col("sa"), col("sb"), col("hu"), lit(1L).as("in_a"), lit(0L).as("in_b"))
    val right = pairs
      .join(rows.withColumnRenamed("slice", "sb"), "sb")
      .select(col("sa"), col("sb"), col("hu"), lit(0L).as("in_a"), lit(1L).as("in_b"))
    val merged = left.unionAll(right)
      .groupBy("sa", "sb", "hu")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("sa", "sb").orderBy(col("hu").asc)))
      .filter(col("rk") <= k)
    merged.groupBy("sa", "sb")
      .agg(count(lit(1)).as("n_union"), max("hu").as("h_max"),
        sum(expr("in_a * in_b")).as("matches"))
      .withColumn("union_est",
        when(col("n_union") < k, col("n_union"))
          .otherwise(expr(s"CAST((${k - 1} * CAST($U64 AS DECIMAL(38,0))) div h_max AS BIGINT)")))
      .withColumn("jacc_ppm", expr("1000000 * matches div n_union"))
      .withColumn("inter_est", expr("jacc_ppm * union_est div 1000000"))
      .join(broadcast(
        sketches.select(col("slice").as("sa"), col("est").as("est_a")).distinct()), "sa")
      .join(broadcast(
        sketches.select(col("slice").as("sb"), col("est").as("est_b")).distinct()), "sb")
      .select("sa", "sb", "est_a", "est_b", "union_est", "matches", "jacc_ppm", "inter_est")
  }

  /** Per-group HLL sketch of `valueCol` (binary, persistable). */
  def distinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Roll previously-built sketches up to a coarser grouping and estimate.
    * This is the rescan-free path: day → month → all-time reuses state. */
  def rollupEstimate(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as("approx_distinct"))

  /** One-shot estimate per group (sketch + estimate fused). */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): Column =
    hll_sketch_estimate(hll_sketch_agg(col(valueCol)))

  /** Per-group mergeable QUANTILE sketches (binary, persistable) — the
    * percentile analog of [[distinctSketches]]: build per-fine-group,
    * roll up with [[rollupQuantiles]] without rescanning raw data. */
  def quantileSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       relativeError: Double = 0.01): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.QuantileSketchFunctions
        .quantileSketch(col(valueCol), relativeError).as("qsketch"))

  /** Column label for quantile q: exact decimal, not a rounded integer —
    * p50, p99, p99_5, p99_99 — so distinct quantiles can never collide on
    * a name (0.995 and 1.0 used to both round to "p100"). */
  private[operators] def quantileLabel(q: Double): String = {
    val pct = new java.math.BigDecimal(q.toString).movePointRight(2)
      .stripTrailingZeros.toPlainString
    "p" + pct.replace(".", "_").replace("-", "m")
  }

  /** Merge previously-built quantile sketches up to a coarser grouping and
    * read out the requested quantiles — rank error stays within the build
    * ε through the merge (GK summaries compose). */
  def rollupQuantiles(sketches: DataFrame, groupCols: Seq[String],
                      qs: Seq[Double]): DataFrame = {
    val labels = qs.map(quantileLabel)
    require(labels.distinct.size == labels.size,
      s"duplicate quantile labels: ${labels.mkString(", ")}")
    val merged = sketches.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.QuantileSketchFunctions
        .quantileSketchMerge(col("qsketch")).as("merged"))
    merged.select(groupCols.map(col) ++ qs.zip(labels).map { case (q, lbl) =>
      graft.functions.QuantileSketchFunctions.sketchQuantile(col("merged"), q).as(lbl)
    }: _*)
  }

  /** One-shot per-group estimate as a frame — the single-pass baseline the
    * merge property is checked against: rolling finer sketches up through
    * `hll_union_agg` must land on the SAME registers (union = per-register
    * max, exactly what one pass over all values builds), so estimates are
    * equal, not merely close. q60 turns that invariant into an oracle. */
  def oneShotEstimate(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK))).as("approx_distinct"))

  /** Per-group mergeable COUNT-MIN frequency sketches (binary,
    * persistable) — the point-lookup analog of [[topKSketches]]: where
    * top-k answers "what are the heavy hitters?", count-min answers "how
    * often did THIS item occur?" for any item, in a fixed depth×width
    * grid (+εN overestimate, never under). Counters are sums, so rollups
    * land on the IDENTICAL grid a one-shot build produces (q97 pins it). */
  def freqSketches(df: DataFrame, groupCols: Seq[String], itemCol: String,
                   depth: Int = 5, width: Int = 2048, seed: Int = 42): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.CountMinFunctions
        .countMinSketchOf(col(itemCol), depth, width, seed).as("cms"))

  /** Union previously-built count-min sketches to a coarser grouping —
    * the rescan-free rollup; read estimates out with
    * [[graft.functions.CountMinFunctions.countMinEstimate]]. */
  def rollupFreq(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.CountMinFunctions.countMinMerge(col("cms")).as("cms"))

  /** Per-group mergeable TOP-K FREQUENCY sketches (DataSketches
    * frequent-items via `approx_top_k_accumulate`) — the heavy-hitter
    * analog of [[distinctSketches]]/[[quantileSketches]]: build per
    * fine group, persist the binary state, roll up to any coarser
    * grouping with [[rollupTopK]] without rescanning raw data. While the
    * tracked-item budget exceeds the group's distinct count the sketch is
    * EXACT (no evictions), which is what q65 pins against the oracle; past
    * that it degrades to ±εN guarantees on the heavy hitters. */
  def topKSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   maxItemsTracked: Int = 100000): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_top_k_accumulate($valueCol, $maxItemsTracked)").as("tk_state"))

  /** Merge previously-built top-k sketches up to a coarser grouping and
    * read out the k most frequent items as (group…, item, est_count) rows. */
  def rollupTopK(sketches: DataFrame, groupCols: Seq[String], k: Int,
                 maxItemsTracked: Int = 100000): DataFrame = {
    val merged = sketches.groupBy(groupCols.map(col): _*)
      .agg(expr(s"approx_top_k_combine(tk_state, $maxItemsTracked)").as("tk_state"))
    merged
      .select(groupCols.map(col) :+
        explode(expr(s"approx_top_k_estimate(tk_state, $k)")).as("e"): _*)
      .select(groupCols.map(col) :+ col("e.item").as("item") :+
        col("e.count").as("est_count"): _*)
  }
}
