package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C117: classical SEASONAL DECOMPOSITION + residual anomalies — the
 * "is today actually unusual" question neither threshold alarms nor
 * CUSUM answer on periodic series: a Monday volume drop is noise if
 * Mondays are always low; the anomaly is the deviation AFTER the trend
 * and the periodic pattern are removed. The classical additive
 * decomposition (trend by centered moving average, seasonal index =
 * per-phase mean of the detrended series, residual = what's left) is
 * the standard first pass on monitoring series and is EXACTLY
 * integer-expressible — this operator computes it ×period-scaled so
 * the DuckDB oracle replays it bit-for-bit:
 *
 *  - trend_num_t  = Σ_{|i−t|≤h} x_i  (h = period div 2, period ODD;
 *    only rows with a full period-wide frame keep a trend — edges
 *    have no centered MA, classical behavior)
 *  - detrended    dd_t = period·x_t − trend_num_t
 *  - seasonal     s_p  = (Σ_{phase(t)=p} dd_t) div n_p, then centered
 *    by the phase-mean (both truncating toward zero — Spark `div` and
 *    DuckDB `//` agree on negatives)
 *  - residual     resid_t = dd_t − s_phase(t)  (×period units)
 *
 * Scale shape: the input is the PRE-AGGREGATED series frame (one row
 * per time bucket — horizon-sized, not corpus-sized; the corpus scan
 * is the caller's groupBy). The centered-MA window is global over that
 * bounded frame (the Drift/Sweep convention for horizon-sized frames),
 * the seasonal index is a period-sized aggregate, and the residual
 * join broadcasts it. Nothing here grows with corpus rows.
 */
object Seasonal {

  /** Decompose one series and score every interior point's residual.
    *
    * @param daily    pre-aggregated series: one row per time bucket.
    * @param timeCol  ordering column (unique per row).
    * @param valueCol integer metric per bucket.
    * @param phaseCol periodic phase in [0, period) — e.g.
    *                 `datediff(d, anchor) % 7`; the caller picks the
    *                 convention so both engines share it.
    * @param period   ODD season length (7 for day-of-week).
    * @return one row per interior bucket: (t, x, phase, trend_num,
    *         seasonal_fx, resid) — trend_num/seasonal_fx/resid in
    *         ×period units. */
  def decompose(daily: DataFrame, timeCol: Column, valueCol: Column,
                phaseCol: Column, period: Int): DataFrame = {
    require(period >= 3 && period % 2 == 1, "period must be odd >= 3 (centered MA)")
    val h = period / 2
    val w = Window.partitionBy(lit(1)).orderBy("t").rowsBetween(-h, h)
    val detr = daily.select(timeCol.as("t"), valueCol.as("x"), phaseCol.as("phase"))
      .withColumn("trend_num", sum(col("x")).over(w))
      .withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === period) // interior: full centered frame only
      .withColumn("dd", lit(period.toLong) * col("x") - col("trend_num"))
    // per-phase seasonal indices, centered so they sum ~0 — a
    // period-sized frame, broadcast back onto the series
    val seas = detr.groupBy("phase")
      .agg(sum(col("dd")).as("s_num"), count(lit(1)).as("n_p"))
      .withColumn("s_raw", expr("s_num div n_p"))
      .withColumn("s_all", sum(col("s_raw")).over(Window.partitionBy(lit(1))))
      .withColumn("s_mean", expr(s"s_all div $period"))
      .select(col("phase"), (col("s_raw") - col("s_mean")).as("seasonal_fx"))
    detr.join(broadcast(seas), "phase")
      .select(col("t"), col("x"), col("phase"), col("trend_num"),
        col("seasonal_fx"), (col("dd") - col("seasonal_fx")).as("resid"))
  }
}
