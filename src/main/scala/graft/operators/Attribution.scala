package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * B47: MULTI-TOUCH attribution — position-based (U-shaped) conversion
 * credit, the marketing-activation workload one step past D5's
 * single-touch as-of (q44 answers "which touch gets ALL the credit";
 * every ads/CRM destination the reference pushes to also wants the
 * multi-touch split: 40% first touch, 40% last, 20% across the middles).
 *
 * Shape: NO touch×conversion join — each touch finds its next conversion
 * with the [[AsOf.joinForward]] single-shuffle window pass (touch belongs
 * to the first conversion after it, within the lookback), then one
 * conversion-partitioned window ranks the touch path. Cost is linear in
 * touches at any scale; the per-conversion frame is one user's touches.
 *
 * Exact-integer credit (ppm), conserving 10⁶ per conversion EXACTLY:
 * n=1 → 1 000 000; n=2 → 500 000 each (the middle pool folds into the
 * endpoints); n>2 → first 400 000, middles 200 000 div (n−2) each, last
 * 400 000 + the middle pool's division remainder. Attributed money =
 * `value_cents·credit_ppm div 10⁶` — truncating, replayed exactly by the
 * oracle (the sub-cent residue per touch is the documented cost of
 * integer determinism).
 */
object Attribution {

  /** @param touches      (event_id, userCol, channel, touchTimeCol) —
    *                     event_id breaks equal-timestamp order ties
    * @param conversions  (userCol, convTimeCol, conv_id, value_cents) —
    *                     pre-deduplicated per (user, time)
    * @param lookbackUs   max touch→conversion gap, in the time unit used
    * @return per (channel, position_class): touch count, total credit
    *         ppm, attributed cents — bounded-key output. */
  /** The PER-TOUCH credit frame — one row per credited touch with its
    * conversion ownership (`c_conv_id`), path position, exact ppm credit
    * and truncated money split. [[positionBased]] aggregates this; specs
    * assert the conservation invariant directly on it. */
  def positionBasedCredits(touches: DataFrame, conversions: DataFrame, lookbackUs: Long,
                           userCol: String = "user_id", touchTimeCol: String = "ts_us",
                           convTimeCol: String = "conv_ts"): DataFrame = {
    val tagged = AsOf.joinForward(touches, conversions, userCol,
      touchTimeCol, convTimeCol, Seq("conv_id", convTimeCol, "value_cents"), "c_")
    val in = tagged.filter(col("c_conv_id").isNotNull &&
      col(s"c_$convTimeCol") - col(touchTimeCol) <= lookbackUs)
    val w = Window.partitionBy("c_conv_id").orderBy(col(touchTimeCol), col("event_id"))
    val wn = Window.partitionBy("c_conv_id")
    in
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("credit_ppm",
        when(col("n") === 1, 1000000L)
          .when(col("n") === 2, 500000L)
          .when(col("pos") === 1, 400000L)
          .when(col("pos") === col("n"),
            lit(400000L) + (lit(200000L) - expr("200000 div (n - 2) * (n - 2)")))
          .otherwise(expr("200000 div (n - 2)")))
      .withColumn("position_class",
        when(col("pos") === 1, "first")
          .when(col("pos") === col("n"), "last")
          .otherwise("middle"))
      .withColumn("attributed_cents", expr("c_value_cents * credit_ppm div 1000000"))
  }

  def positionBased(touches: DataFrame, conversions: DataFrame, lookbackUs: Long,
                    userCol: String = "user_id", touchTimeCol: String = "ts_us",
                    convTimeCol: String = "conv_ts"): DataFrame =
    positionBasedCredits(touches, conversions, lookbackUs, userCol, touchTimeCol, convTimeCol)
      .groupBy("channel", "position_class")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_ppm")).as("credit_ppm_total"),
        sum(col("attributed_cents")).as("attributed_cents_total"))
      .orderBy("channel", "position_class")

  /** B52: TIME-DECAY attribution — the other industry-standard split
    * beside [[positionBased]]'s U-shape (position says WHERE in the
    * path; decay says HOW LONG AGO — a touch h half-lives before the
    * conversion carries 2^−h of a fresh touch's weight). Exact-integer
    * recipe conserving 10⁶ per conversion EXACTLY: raw weight
    * w = 10⁶ div 2^min(gap div halflife, 19) (the cap floors the
    * weight at 1 — a within-lookback touch never vanishes to 0),
    * credit = 10⁶·w div Σw truncating, and the whole division
    * remainder goes to the MOST RECENT touch (the touch time-decay
    * favors anyway — deterministic, spec-pinned conservation).
    *
    * Same single-shuffle shape as positionBased: AsOf.joinForward
    * ownership, two conversion-partitioned windows (weight sum, then
    * credit-remainder), per-conversion frame = one user's touches. */
  def timeDecayCredits(touches: DataFrame, conversions: DataFrame,
                       lookbackUs: Long, halflifeUs: Long,
                       userCol: String = "user_id", touchTimeCol: String = "ts_us",
                       convTimeCol: String = "conv_ts"): DataFrame = {
    require(halflifeUs > 0)
    val tagged = AsOf.joinForward(touches, conversions, userCol,
      touchTimeCol, convTimeCol, Seq("conv_id", convTimeCol, "value_cents"), "c_")
    val in = tagged.filter(col("c_conv_id").isNotNull &&
      col(s"c_$convTimeCol") - col(touchTimeCol) <= lookbackUs)
    val w = Window.partitionBy("c_conv_id").orderBy(col(touchTimeCol), col("event_id"))
    val wn = Window.partitionBy("c_conv_id")
    in
      .withColumn("half_lives", expr(
        s"(c_$convTimeCol - $touchTimeCol) div ${halflifeUs}L"))
      .withColumn("wgt", expr(
        "1000000L div shiftleft(1L, CAST(least(half_lives, 19) AS INT))"))
      .withColumn("wsum", sum(col("wgt")).over(wn))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("credit_base", expr("1000000 * wgt div wsum"))
      .withColumn("credit_ppm",
        col("credit_base") + when(col("pos") === col("n"),
          lit(1000000L) - sum(col("credit_base")).over(wn)).otherwise(0L))
      .withColumn("attributed_cents", expr("c_value_cents * credit_ppm div 1000000"))
      .drop("credit_base")
  }

  def timeDecay(touches: DataFrame, conversions: DataFrame,
                lookbackUs: Long, halflifeUs: Long,
                userCol: String = "user_id", touchTimeCol: String = "ts_us",
                convTimeCol: String = "conv_ts"): DataFrame =
    timeDecayCredits(touches, conversions, lookbackUs, halflifeUs,
        userCol, touchTimeCol, convTimeCol)
      .groupBy("channel", "half_lives")
      .agg(count(lit(1)).as("n_touches"),
        sum(col("credit_ppm")).as("credit_ppm_total"),
        sum(col("attributed_cents")).as("attributed_cents_total"))
      .orderBy("channel", "half_lives")
}
