package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C147: exact ROC-AUC — the ranking-quality scalar of the classifier
 * family (C65 trains, C68 sweeps thresholds into confusion matrices,
 * C77 calibrates per domain; AUC is the threshold-FREE number those
 * reports get compared by): the probability a random positive outranks
 * a random negative, ties at half credit — the Mann–Whitney U
 * identity, NOT a curve integration, so it is exact in integers:
 *
 *   U₂ = Σ_over distinct scores s  n_pos(s) · (2·cumneg(<s) + n_neg(s))
 *   auc_ppm = 10⁶·U₂ div (2·n_pos·n_neg)
 *
 * (U₂ is twice the tie-aware U, keeping the half-credit term integral.)
 *
 * Scale shape — the Zipf/equi-depth two-level discipline: one corpus
 * scan reduces to the DISTINCT-SCORE frame (one map-side-partial
 * pos/neg count per score — sized by the score domain, not the
 * corpus); the cumulative-negative window runs on that frame alone
 * (the one single-task window, value-domain-bounded by design —
 * quantize continuous scores first); totals ride the same aggregate.
 * No per-row global rank, no pos×neg pair join.
 */
object Evaluation {

  /** @param df       scored rows.
    * @param labelCol true/1 = positive.
    * @param scoreCol INTEGER score (quantize continuous scores at the
    *                 call site — the per-mille/ppm house discipline).
    * @return ONE row: (n_pos, n_neg, n_scores, u2, auc_ppm, gini_ppm) —
    *         auc NULL when either class is empty; gini = 2·AUC − 1 in
    *         ppm (the accuracy-ratio form). */
  def rocAuc(df: DataFrame, labelCol: Column, scoreCol: Column): DataFrame =
    rocAucFromCounts(
      df.select(scoreCol.cast("long").as("s"),
          when(labelCol.cast("boolean"), 1L).otherwise(0L).as("pos"))
        .groupBy("s")
        .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn")))

  /** [[rocAuc]] from a pre-aggregated per-score (s, np, nn) count frame
    * — the entry point incremental maintenance uses (per-score counts
    * are ADDITIVE, so a maintained count frame is exactly the one-shot
    * frame of all data so far; D37 re-prices AUC from it per version). */
  def rocAucFromCounts(byScore: DataFrame): DataFrame = {
    val wBelow = Window.partitionBy(lit(1)).orderBy(col("s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("cumneg", coalesce(sum(col("nn")).over(wBelow), lit(0L)))
      .withColumn("u2_term", expr(
        "CAST(np AS DECIMAL(38,0)) * (2 * cumneg + nn)"))
      .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        count(lit(1)).as("n_scores"), sum(col("u2_term")).as("u2d"))
      .select(col("n_pos"), col("n_neg"), col("n_scores"),
        col("u2d").cast("long").as("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0, expr(
          "CAST(1000000 * u2d div (CAST(2 AS DECIMAL(38,0)) * n_pos * n_neg) AS BIGINT)"))
          .as("auc_ppm"))
      .withColumn("gini_ppm", col("auc_ppm") * 2 - 1000000L)
  }
}
