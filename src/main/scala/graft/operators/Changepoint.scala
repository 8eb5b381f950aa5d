package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C115: CUSUM CHANGEPOINT detection per series — the "WHEN did this
 * metric shift" question the drift family's distribution tests don't
 * answer: KS/TVD (C99, B43) say a slice's distribution moved; CUSUM
 * (Page 1954) localizes the shift in TIME, per monitored series, in one
 * pass. The corpus-maintenance use: a source's daily volume or quality
 * score drifts slowly — threshold alarms miss it, CUSUM accumulates it.
 *
 * The classic recursion S_t = max(0, S_{t−1} + (x_t − k)) is not
 * window-expressible, but its CLOSED FORM is: with cum_t = Σ_{j≤t}
 * (x_j − k), the high-side statistic is S_t = cum_t − min_{0≤i≤t} cum_i
 * (cum_0 = 0), and symmetrically the low side is max_{0≤i≤t} cum_i −
 * cum_t — one running sum plus one running extremum per side, all
 * window functions over the series order.
 *
 * EXACT integer form, so the DuckDB oracle replays it bit-for-bit: the
 * reference level k is the series mean, folded in WITHOUT division by
 * scaling everything by the series length n — define
 * cum′_t = n·Σ_{j≤t} x_j − t·Σx (so cum′ is n·(cum against the exact
 * mean)). The reported peak is normalized per-mille of the series'
 * total mass: `pm = 1000·S′_peak div (n·Σx)`, taken in DECIMAL(38,0).
 * Intermediates stay in int64 while n·Σx < 2⁶³ — e.g. ten years of
 * daily points (n≈3650) against per-series totals up to ~2.5·10¹⁵;
 * beyond that, pre-aggregate to a coarser grain (the usual practice) or
 * widen cum′ to DECIMAL on both engines.
 *
 * Scale shape: ONE scan reduces to the (series × time-bucket) frame;
 * every window partitions BY SERIES ordered by time — no global window,
 * no driver state, partition size = points per series (time-bucketed,
 * so bounded by the monitoring horizon, not the corpus). A shifted
 * series alarms at the point where the cumulated excursion peaks —
 * exactly argmax_t S′_t, reported with deterministic earliest-time
 * tie-breaks.
 */
object Changepoint {

  /** Per-series two-sided CUSUM vs a FIXED reference level, with carried
    * excursion state — the ONLINE form (the batch form's k is the
    * series' own mean; a monitor's k is the calibration level, so the
    * statistic is incrementally maintainable). The recursion
    * S_t = max(0, S_{t−1} + (x_t − k)) with S_0 = C (the carry from all
    * prior batches) unrolls to the SAME closed form with the virtual
    * origin moved: S_t = cum_t − min(−C, min_{i≤t} cum_i) — so a batch
    * cut anywhere continues the exact walk (the kernel-equality law the
    * D30 spec pins). Low side symmetric.
    *
    * @param df      this batch's observations.
    * @param carried prior state, one row per series: (series, s_high,
    *                s_low); series absent here start at 0/0.
    * @param level   the reference level k (pre-scale fractional levels
    *                and values to integers).
    * @return one row per series SEEN IN df: (series, n_points, end_high,
    *         end_low, peak_high, peak_high_at, peak_low, peak_low_at) —
    *         the carry-out state and this batch's peak excursions with
    *         earliest-tie times (peaks include the carry, so an elevated
    *         walk keeps alarming while it stays elevated). */
  def cusumVsReference(df: DataFrame, series: Column, timeCol: Column, value: Column,
                       level: Long, carried: Option[DataFrame] = None): DataFrame = {
    val base = df.select(series.as("series"), timeCol.as("t"), value.as("x"))
    val state = carried.getOrElse(
      df.sparkSession.emptyDataFrame
        .select(lit(null).cast(base.schema("series").dataType).as("series"),
          lit(0L).as("s_high"), lit(0L).as("s_low")).limit(0))
      .select(col("series"), col("s_high").as("c_high"), col("s_low").as("c_low"))
    val wAll = Window.partitionBy("series")
    val wCum = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = base
      // carried state is one row per monitored series — broadcast-sized
      .join(broadcast(state), Seq("series"), "left")
      .withColumn("c_high", coalesce(col("c_high"), lit(0L)))
      .withColumn("c_low", coalesce(col("c_low"), lit(0L)))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("rn", row_number().over(Window.partitionBy("series").orderBy("t")))
      .withColumn("cum", sum(col("x") - lit(level)).over(wCum))
      .withColumn("s_high", col("cum") - least(-col("c_high"), min(col("cum")).over(wCum)))
      .withColumn("s_low", greatest(col("c_low"), max(col("cum")).over(wCum)) - col("cum"))
    val wHigh = Window.partitionBy("series").orderBy(col("s_high").desc, col("t").asc)
    val wLow = Window.partitionBy("series").orderBy(col("s_low").desc, col("t").asc)
    scored
      .withColumn("rh", row_number().over(wHigh))
      .withColumn("rl", row_number().over(wLow))
      .filter(col("rh") === 1 || col("rl") === 1 || col("rn") === col("n"))
      .groupBy("series")
      .agg(max(col("n")).as("n_points"),
        max(when(col("rn") === col("n"), col("s_high"))).as("end_high"),
        max(when(col("rn") === col("n"), col("s_low"))).as("end_low"),
        max(when(col("rh") === 1, col("s_high"))).as("peak_high"),
        max(when(col("rh") === 1, col("t"))).as("peak_high_at"),
        max(when(col("rl") === 1, col("s_low"))).as("peak_low"),
        max(when(col("rl") === 1, col("t"))).as("peak_low_at"))
  }

  /** Per-series two-sided CUSUM vs the series' own mean level.
    *
    * @param df      observations.
    * @param series  series key column (the monitored slice).
    * @param timeCol ordering column (time bucket; must be unique per
    *                series — pre-aggregate duplicates first).
    * @param value   integer metric per bucket.
    * @return one row per series: (series, n_points, total, high_pm,
    *         high_onset, high_at, low_pm, low_onset, low_at) — per-mille
    *         peak upward / downward cumulated excursions, the estimated
    *         shift onset (latest S=0 at or before the peak; NULL = before
    *         the series starts), and the time each peak is attained
    *         (earliest peak wins ties). */
  def cusum(df: DataFrame, series: Column, timeCol: Column, value: Column): DataFrame = {
    val base = df.select(series.as("series"), timeCol.as("t"), value.as("x"))
    val wAll = Window.partitionBy("series")
    val wCum = Window.partitionBy("series").orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = base
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("sx", sum(col("x")).over(wAll))
      .withColumn("rn", row_number().over(Window.partitionBy("series").orderBy("t")))
      // cum′_t = n·cumsum_t − t·Σx : the mean-referenced walk, ×n to
      // stay integer (cum′_0 = 0 is the virtual origin both running
      // extrema must include — hence the least/greatest against 0)
      .withColumn("cumk", col("n") * sum(col("x")).over(wCum) - col("rn") * col("sx"))
      .withColumn("s_high", col("cumk") - least(lit(0L), min(col("cumk")).over(wCum)))
      .withColumn("s_low", greatest(lit(0L), max(col("cumk")).over(wCum)) - col("cumk"))
      // the CHANGE-TIME estimate (CUSUM's MLE): the climb to a peak began
      // the last time the walk touched its running extremum — i.e. the
      // latest t with S = 0 at or before the peak. NULL when the
      // extremum is the virtual origin (shift begins before the series'
      // first point).
      .withColumn("h0", max(when(col("s_high") === 0, col("t"))).over(wCum))
      .withColumn("l0", max(when(col("s_low") === 0, col("t"))).over(wCum))
    // both peaks picked in the SAME pass: two rank windows over the one
    // series-partitioned frame (they reuse its shuffle), then a
    // series-sized conditional aggregation — no self-join, the scored
    // walk is computed once
    val wHigh = Window.partitionBy("series").orderBy(col("s_high").desc, col("t").asc)
    val wLow = Window.partitionBy("series").orderBy(col("s_low").desc, col("t").asc)
    def pm(c: String): Column =
      // an all-zero series has Σx = 0: flat by definition — 0, not a
      // division error; `div` = truncating integral division, the same
      // operator the DuckDB oracle's `//` replays
      when(col("sx") > 0,
        expr(s"cast(cast($c as decimal(38,0)) * 1000 div (cast(n as decimal(38,0)) * sx) as long)"))
        .otherwise(lit(0L))
    scored
      .withColumn("rh", row_number().over(wHigh))
      .withColumn("rl", row_number().over(wLow))
      .filter(col("rh") === 1 || col("rl") === 1)
      .groupBy("series")
      .agg(max(col("n")).as("n_points"), max(col("sx")).as("total"),
        max(when(col("rh") === 1, pm("s_high"))).as("high_pm"),
        max(when(col("rh") === 1, col("h0"))).as("high_onset"),
        max(when(col("rh") === 1, col("t"))).as("high_at"),
        max(when(col("rl") === 1, pm("s_low"))).as("low_pm"),
        max(when(col("rl") === 1, col("l0"))).as("low_onset"),
        max(when(col("rl") === 1, col("t"))).as("low_at"))
  }
}
