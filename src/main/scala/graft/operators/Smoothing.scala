package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C144/C145: per-series TIME-SERIES smoothing + lead-lag analysis — the
 * two classic monitoring lenses the family still lacked: A41 fits ONE
 * straight line per series, C115 localizes a LEVEL SHIFT, C117 strips
 * a KNOWN period, D23/D27/D29 compare distributions; none gives the
 * running level estimate operations actually page on ("today vs what
 * the smoothed history predicted"), and none asks whether one series
 * LEADS another.
 *
 *  - EWMA (C144): s_t = (a·x_t·S + (b−a)·s_{t−1}) div b — exponential
 *    smoothing with rational α = a/b in fixed-point S = 1000, one
 *    truncating division per step so both engines replay the walk
 *    bit-for-bit (no closed form exists under truncation — unlike
 *    CUSUM's min-of-cumsum identity — so the walk is an explicit
 *    per-series fold). The one-step-ahead forecast IS s_{t−1}; the
 *    signed forecast error x_t·S − s_{t−1} is the alarm input.
 *
 *  - LEAD-LAG cross-correlation (C145): corr(x_t, y_{t+L}) for every
 *    lag L in [−maxLag, maxLag] over the co-observed day pairs — "does
 *    clicks lead purchases, and by how many days". Exact integer power
 *    sums (the A33/q112 recipe) with ONE mirrored double read-out per
 *    lag.
 *
 * Overflow contract: the fold steps multiply values by a·S ≤ aDen·1000,
 * so |v| must stay below 2⁶³/(aDen·1000) ≈ 9·10¹⁴ at the defaults —
 * comfortably above any per-bucket aggregate a monitor watches; rescale
 * the unit (cents → whole units) past that.
 *
 * Scale shape: both operators run on the (series × time-bucket) frame —
 * ONE corpus scan pre-aggregates to it, and its size is bounded by the
 * monitoring horizon, not the corpus (the C115 argument). The EWMA fold
 * collects each series' bucketed points into one array — partition =
 * series, array length = horizon (e.g. 3650 for ten daily years;
 * pre-aggregate to a coarser grain beyond) — and the codegen'd
 * `aggregate` HOF walks it without a shuffle per step. The lag join
 * fans the day frame out ×(2·maxLag+1) and joins day-to-day — all
 * horizon-sized frames.
 */
object Smoothing {

  /** C144: per-series EWMA level + one-step-ahead forecast error.
    *
    * @param df     pre-aggregated series points (one row per
    *               series × time bucket).
    * @param series series key column.
    * @param timeCol INTEGER time bucket (e.g. epoch day) — defines the
    *                walk order; ties are undefined, pre-aggregate.
    * @param value  integer observation (scale money to cents first).
    * @param aNum   α numerator; `aNum/aDen` is the smoothing weight of
    *               the CURRENT observation.
    * @param aDen   α denominator.
    * @return one row per input point: (series, t, v, sm, fc, err) —
    *         sm = the smoothed level ×1000, fc = the previous sm (NULL
    *         at the series head), err = v·1000 − fc (signed). */
  def ewma(df: DataFrame, series: Column, timeCol: Column, value: Column,
           aNum: Long = 1L, aDen: Long = 4L,
           carried: Option[DataFrame] = None): DataFrame = {
    require(aNum >= 1 && aNum < aDen, "need 0 < a/b < 1")
    val S = 1000L
    val step = (prev: String, v: String) =>
      s"(${aNum}L * $v * ${S}L + ${aDen - aNum}L * $prev) div ${aDen}L"
    val base = df.select(series.as("series"), timeCol.cast("long").as("t"),
        value.cast("long").as("v"))
      .groupBy("series")
      .agg(sort_array(collect_list(struct(col("t"), col("v")))).as("arr"))
    // carried level per series (the D36 monitor's state, one row per
    // series — broadcast-sized): the series head smooths AGAINST the
    // carry instead of initializing from its own first value, so a walk
    // cut anywhere across batches continues the exact same walk
    val withCarry = carried match {
      case Some(c) => base.join(
        broadcast(c.select(col("series"), col("sm").cast("long").as("__c"))),
        Seq("series"), "left")
      case None => base.withColumn("__c", lit(null).cast("long"))
    }
    withCarry
      .withColumn("walk", expr(
        s"""aggregate(
           |  slice(arr, 2, size(arr) - 1),
           |  named_struct(
           |    'sm', CASE WHEN __c IS NULL THEN arr[0].v * ${S}L
           |               ELSE ${step("__c", "arr[0].v")} END,
           |    'out', array(named_struct('t', arr[0].t, 'v', arr[0].v,
           |      'sm', CASE WHEN __c IS NULL THEN arr[0].v * ${S}L
           |                 ELSE ${step("__c", "arr[0].v")} END,
           |      'fc', __c))),
           |  (acc, e) -> named_struct(
           |    'sm', ${step("acc.sm", "e.v")},
           |    'out', array_append(acc.out, named_struct('t', e.t, 'v', e.v,
           |      'sm', ${step("acc.sm", "e.v")}, 'fc', acc.sm))),
           |  acc -> acc.out)""".stripMargin))
      .select(col("series"), explode(col("walk")).as("p"))
      .select(col("series"), col("p.t").as("t"), col("p.v").as("v"),
        col("p.sm").as("sm"), col("p.fc").as("fc"),
        (col("p.v") * S - col("p.fc")).as("err"))
  }

  /** C148: HOLT linear-trend (double exponential) smoothing — the
    * trend-following upgrade over [[ewma]] (a plain EWMA lags a
    * trending series forever; Holt carries a trend term so the
    * one-step-ahead forecast l+tr tracks a drift): with rational
    * α = a/b, β = p/q in fixed point S = 1000,
    *
    *   fc_t = l_{t−1} + tr_{t−1}                 (forecast BEFORE x_t)
    *   l_t  = (a·x_t·S + (b−a)·fc_t) div b
    *   tr_t = (p·(l_t − l_{t−1}) + (q−p)·tr_{t−1}) div q
    *
    * init l_1 = x_1·S, tr_1 = 0 (the trend is learned, not seeded).
    * Same fold discipline, overflow bound and oracle shape (recursive
    * CTE, two carried columns) as [[ewma]]; truncation toward zero on
    * the possibly-negative trend matches Spark div = DuckDB `//`.
    *
    * @return (series, t, v, level, trend, fc, err) per point — fc NULL
    *         at the series head, err = v·1000 − fc signed. */
  def holt(df: DataFrame, series: Column, timeCol: Column, value: Column,
           aNum: Long = 2L, aDen: Long = 10L,
           bNum: Long = 1L, bDen: Long = 10L): DataFrame = {
    require(aNum >= 1 && aNum < aDen && bNum >= 1 && bNum < bDen,
      "need 0 < alpha, beta < 1")
    val S = 1000L
    // l' appears in its own right and inside tr' — HOF lambdas have no
    // let-binding, so the expression repeats (the ewma precedent)
    val lNew = (l: String, tr: String, v: String) =>
      s"(${aNum}L * $v * ${S}L + ${aDen - aNum}L * ($l + $tr)) div ${aDen}L"
    val step = (l: String, tr: String, v: String) => (
      lNew(l, tr, v),
      s"(${bNum}L * (${lNew(l, tr, v)} - $l) + ${bDen - bNum}L * $tr) div ${bDen}L")
    val (l1, t1) = step("acc.l", "acc.tr", "e.v")
    df.select(series.as("series"), timeCol.cast("long").as("t"),
        value.cast("long").as("v"))
      .groupBy("series")
      .agg(sort_array(collect_list(struct(col("t"), col("v")))).as("arr"))
      .withColumn("walk", expr(
        s"""aggregate(
           |  slice(arr, 2, size(arr) - 1),
           |  named_struct(
           |    'l', arr[0].v * ${S}L, 'tr', 0L,
           |    'out', array(named_struct('t', arr[0].t, 'v', arr[0].v,
           |      'level', arr[0].v * ${S}L, 'trend', 0L,
           |      'fc', CAST(NULL AS BIGINT)))),
           |  (acc, e) -> named_struct(
           |    'l', $l1, 'tr', $t1,
           |    'out', array_append(acc.out, named_struct('t', e.t, 'v', e.v,
           |      'level', $l1, 'trend', $t1, 'fc', acc.l + acc.tr))),
           |  acc -> acc.out)""".stripMargin))
      .select(col("series"), explode(col("walk")).as("p"))
      .select(col("series"), col("p.t").as("t"), col("p.v").as("v"),
        col("p.level").as("level"), col("p.trend").as("trend"),
        col("p.fc").as("fc"), (col("p.v") * S - col("p.fc")).as("err"))
  }

  /** C145: lead-lag cross-correlation between two integer series —
    * corr(x at t, y at t+lag) per lag, over co-observed buckets only.
    *
    * @param xs (t, x) — one row per time bucket.
    * @param ys (t, y) — one row per time bucket.
    * @return one row per lag in [−maxLag, maxLag] with ≥ 3 co-observed
    *         pairs: (lag, n, sx, sy, sxy, sxx, syy, corr) — exact
    *         integer power sums + the single mirrored double corr. */
  def leadLagCorr(xs: DataFrame, ys: DataFrame, maxLag: Int): DataFrame = {
    require(maxLag >= 0)
    val lags = xs.sparkSession.range(-maxLag.toLong, maxLag + 1L)
      .select(col("id").as("lag"))
    val x = xs.select(col("t").cast("long").as("t"), col("x").cast("long").as("x"))
    val y = ys.select(col("t").cast("long").as("ty"), col("y").cast("long").as("y"))
    val d = (c: Column) => c.cast("double")
    x.crossJoin(broadcast(lags))
      .withColumn("ty", col("t") + col("lag"))
      .join(y, Seq("ty"))
      .groupBy("lag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
        sum(expr("cast(y as decimal(38,0)) * y")).as("syy"))
      .filter(col("n") >= 3)
      .select(col("lag"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"),
        // NULL (not NaN) for a constant side — exact integer guard both
        // engines evaluate identically
        when(expr("n * sxx - cast(sx as decimal(38,0)) * sx > 0") &&
             expr("n * syy - cast(sy as decimal(38,0)) * sy > 0"),
          (d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
            (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
             sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
          .as("corr"))
  }
}
