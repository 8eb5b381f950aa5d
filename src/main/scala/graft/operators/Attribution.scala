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

  // ------------------------------------------------------------- B53 Markov

  /** B53 kernel: first-order JOURNEY TRANSITION counts. Per user, events
    * in (ts, tie) order split into journeys at each conversion (the
    * conversion terminates its journey; the next event starts a new
    * one). States: `START` opens every journey, each non-conversion
    * channel is itself, a conversion event is the absorbing `CONV`, and
    * a journey with no conversion ends in the absorbing `NULL`.
    *
    * Scale shape: two windows per user (journey split + lead), both
    * frames bounded by that user's event count; the output is the
    * (channels+2)² transition frame — bounded by the CHANNEL VOCABULARY
    * (the q19-pivot discipline: channels are a bounded enum, document
    * the cap when they are not), independent of corpus rows.
    *
    * @return (src, dst, n) transition counts. */
  def markovTransitions(events: DataFrame, userCol: String, channelCol: String,
                        tsCol: String, tieCol: String,
                        convChannel: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).asc, col(tieCol).asc)
    val wPrior = w.rowsBetween(Window.unboundedPreceding, -1)
    val st = events
      .withColumn("__conv", col(channelCol) === lit(convChannel))
      .withColumn("__state", when(col("__conv"), lit("CONV")).otherwise(col(channelCol)))
      .withColumn("__j", coalesce(sum(when(col("__conv"), 1L).otherwise(0L)).over(wPrior), lit(0L)))
    val wj = Window.partitionBy(col(userCol), col("__j"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val seq = st
      .withColumn("__rn", row_number().over(wj))
      .withColumn("__nxt", lead(col("__state"), 1).over(wj))
    val starts = seq.filter(col("__rn") === 1)
      .select(lit("START").as("src"), col("__state").as("dst"))
    val steps = seq.filter(col("__state") =!= "CONV")
      .select(col("__state").as("src"), coalesce(col("__nxt"), lit("NULL")).as("dst"))
    starts.unionByName(steps).groupBy("src", "dst").agg(count(lit(1)).as("n"))
  }

  /** B53: MARKOV REMOVAL-EFFECT attribution — the data-driven
    * multi-touch model (Anderl et al. 2014, the "Markov chain
    * attribution" every martech stack quotes): journeys become a
    * first-order chain, conversion probability is the absorption
    * probability of `CONV` from `START`, and a channel's value is its
    * REMOVAL EFFECT — how much conversion drops when that channel's
    * node is knocked out (its visits absorb into `NULL`). Credit shares
    * normalize the removal effects. Unlike position/time-decay rules
    * (B47/B52), the credit comes from the observed path structure.
    *
    * EXACT arithmetic contract: absorption probabilities are defined as
    * `rounds` SYNCHRONIZED Jacobi sweeps of the value iteration
    *
    *   v(s) ← Σ_t n(s,t)·v(t) div n_out(s),  v(CONV) = 10⁶ fixed,
    *
    * from v = 0, all in integers (products in BigInt / HUGEINT) — both
    * engines replay the same truncating sweeps, so every output is
    * bit-stable. The iterate rises monotonically toward the true
    * absorption probability; 32 sweeps land within ~2⁻³² of the fixed
    * point for any sub-stochastic chain with conversion reachable —
    * the documented statistic IS the 32-sweep value (the C108
    * fixed-round discipline).
    *
    * Scale shape: the corpus collapses to the transition frame in one
    * pass ([[markovTransitions]]); the (channels+2)-state solve runs
    * DRIVER-SIDE on that bounded frame (the k-means/power-iteration
    * discipline: bounded model state on the driver, corpus-sized work
    * in the cluster), once per channel plus the baseline.
    *
    * @return one row per channel: (channel, n_touches, p_base_ppm,
    *         p_removed_ppm, removal_ppm, attribution_ppm) —
    *         attribution NULL when no channel has positive removal. */
  def markovRemoval(events: DataFrame, userCol: String, channelCol: String,
                    tsCol: String, tieCol: String, convChannel: String,
                    rounds: Int = 32): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val trDf = markovTransitions(events, userCol, channelCol, tsCol, tieCol, convChannel)
    // bounded driver state: (channels+2)^2 transition rows
    markovAttributionFromCounts(spark,
      trDf.as[(String, String, Long)].collect().toSeq, rounds)
  }

  /** The B53 pricing kernel over a TRANSITION-COUNT frame — shared by
    * the one-shot [[markovRemoval]] and the continuously-maintained
    * monitor (D39, `streaming/EventStreams.markovAttributionMonitor`),
    * so "attribution from maintained state" equals "attribution from
    * the corpus" by construction (the D32 discipline). Transition
    * counts are ADDITIVE, which is what makes the streaming face
    * exact. */
  def markovAttributionFromCounts(spark: org.apache.spark.sql.SparkSession,
                                  tr: Seq[(String, String, Long)],
                                  rounds: Int = 32): DataFrame = {
    require(rounds >= 1 && rounds <= 256)
    import spark.implicits._
    val nOut = tr.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val channels = (tr.map(_._1) ++ tr.map(_._2)).distinct
      .filterNot(Set("START", "CONV", "NULL")).sorted
    val touches = tr.filter(t => t._2 != "NULL").groupBy(_._2).view
      .mapValues(_.map(_._3).sum).toMap // visits INTO each state
    // CONV/NULL are absorbing (never sources): their values are pinned
    // at lookup — 10^6 and 0 — exactly as the oracle's COALESCE encodes
    def solve(removed: Option[String]): Long = {
      def value(m: Map[String, BigInt], s: String): BigInt =
        if (s == "CONV") BigInt(1000000) else m.getOrElse(s, BigInt(0))
      var v = Map.empty[String, BigInt]
      for (_ <- 1 to rounds) {
        val prev = v
        v = nOut.keys.map { s =>
          s -> (if (removed.contains(s)) BigInt(0)
                else tr.filter(_._1 == s).map(t => BigInt(t._3) * value(prev, t._2)).sum / nOut(s))
        }.toMap
      }
      value(v, "START").toLong
    }
    val pBase = solve(None)
    val rows = channels.map { c =>
      val pc = solve(Some(c))
      (c, touches.getOrElse(c, 0L), pBase, pc, pBase - pc)
    }
    val totalRemoval = rows.map(_._5).sum
    rows.map { case (c, nt, pb, pc, re) =>
      (c, nt, pb, pc, re,
        if (totalRemoval > 0) Some(1000000L * re / totalRemoval) else None)
    }.toSeq
      .toDF("channel", "n_touches", "p_base_ppm", "p_removed_ppm",
        "removal_ppm", "attribution_ppm")
      .orderBy("channel")
  }
}
