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
