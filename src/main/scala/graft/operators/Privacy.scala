package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C114: t-CLOSENESS audit — the third leg of the re-identification-risk
 * family (C84 k-anonymity: class SIZES; C112 l-diversity: class VALUE
 * COUNTS; t-closeness: class value DISTRIBUTIONS). k and l still pass a
 * corpus where an attacker learns the sensitive attribute
 * distributionally — a class whose account-balance histogram is sharply
 * skewed against the population leaks even when it has many members and
 * many distinct values. t-closeness (Li, Li & Venkatasubramanian, ICDE
 * 2007) bounds, per equivalence class, the Earth Mover's Distance
 * between the class's sensitive-value distribution and the global one.
 *
 * For an ORDERED sensitive attribute the EMD has the classic closed
 * form over the sorted value domain v_1 < … < v_m:
 *
 *   EMD(P, Q) = (1/(m−1)) · Σ_i |Σ_{j≤i} (p_j − q_j)|
 *
 * — the mean absolute cumulated-probability gap. Computed EXACTLY in
 * integers so the DuckDB oracle replays it bit-for-bit: with class
 * cumulated counts cum_c(v), class size n_c, global cumulated counts
 * cum_g(v) and corpus size n, each term is |cum_c(v)·n − cum_g(v)·n_c|
 * and the reported statistic is
 *
 *   t_pm = 1000 · Σ_v term(v) div (n_c · n · (m−1))
 *
 * (per-mille EMD; the Σ and the division are taken in DECIMAL(38,0) /
 * HUGEINT so the m·n² sum adds no bound beyond the per-term one — each
 * term's cross product is int64, safe while the corpus row count stays
 * under ~3·10⁹, the same N² contract as [[Drift.ksDrift]]; widen the
 * term to DECIMAL on both engines past that). A single-value domain
 * (m = 1) makes every distribution identical — t_pm is 0 by
 * definition, not a division error.
 *
 * Scale shape: ONE corpus scan reduces to the (class × value) count
 * frame; everything after rides the dense class×value grid — sized by
 * the quasi-identifier cardinality times the sensitive-value domain,
 * independent of corpus rows (bucketize a continuous sensitive
 * attribute first, as the q194 band does). The grid is built with
 * broadcast class-total and 1-row frames, and the ECDF windows
 * partition by class with value-domain-bounded frames — the same
 * discipline as [[Drift.ksDrift]], which this operator deliberately
 * mirrors (t-closeness IS a per-class distribution-distance audit; KS
 * takes the max gap, EMD the mean).
 */
object Privacy {

  /** Per-equivalence-class t-closeness (per-mille EMD vs the corpus).
    *
    * @param df        corpus rows (derive banded quasi-identifiers with
    *                  `withColumn` first — the output keeps `classCols`
    *                  by name).
    * @param classCols quasi-identifier column names (the equivalence
    *                  class).
    * @param valueCol  ORDERED sensitive attribute (integer-band a
    *                  continuous one first).
    * @return one row per class: (classCols…, n_rows, t_pm), t_pm the
    *         per-mille ordered EMD against the global distribution. */
  def tCloseness(df: DataFrame, classCols: Seq[String], valueCol: Column): DataFrame = {
    val counts = df
      .select(classCols.map(col) :+ valueCol.as("v"): _*)
      .groupBy(classCols.head, classCols.tail :+ "v": _*)
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(classCols.head, classCols.tail: _*)
      .agg(sum(col("c")).as("n_c"))
    // 1-row frame: corpus size and the value-domain size m
    val grand = counts.agg(sum(col("c")).as("n_all"),
      countDistinct(col("v")).as("m"))
    // global cumulated counts over the tiny distinct-value frame
    val globalCum = counts.groupBy("v").agg(sum(col("c")).as("gv"))
      .withColumn("cum_g", sum(col("gv")).over(
        Window.partitionBy(lit(1)).orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "cum_g")
    // dense class×value grid so every class's ECDF steps at every
    // observed value (a value a class lacks is exactly where its
    // cumulated gap can peak)
    val grid = counts.select("v").distinct()
      .crossJoin(broadcast(totals.crossJoin(broadcast(grand))))
      .join(counts, classCols :+ "v", "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wCum = Window.partitionBy(classCols.map(col): _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("cum_c", sum(col("c")).over(wCum))
      .join(globalCum, "v")
      .withColumn("term",
        abs(col("cum_c") * col("n_all") - col("cum_g") * col("n_c")))
      .groupBy((classCols.map(col) :+ col("n_c") :+ col("n_all") :+ col("m")): _*)
      .agg(sum(col("term").cast("decimal(38,0)")).as("emd_num"))
      .select((classCols.map(col) :+ col("n_c").as("n_rows") :+
        // m = 1: one global value, every class matches the corpus — 0
        when(col("m") > 1,
          expr("cast(emd_num * 1000 div (cast(n_c as decimal(38,0)) * n_all * (m - 1)) as long)"))
          .otherwise(lit(0L)).as("t_pm")): _*)
  }
}
