package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * B51: KAPLAN–MEIER survival estimation — the censoring-aware lifetime
 * curve none of the lifecycle queries could answer honestly (q59
 * retention counts who came back; a naive "average lifetime" treats
 * still-active subjects as if their story ended today — the classic
 * downward bias): S(t) = Π over event times t_i ≤ t of (1 − d_i/n_i),
 * where d_i = events at t_i and n_i = subjects still at risk
 * (duration ≥ t_i — censored subjects count as at-risk until they
 * leave, which is exactly the information censoring carries).
 *
 * Exact integer form: per-step truncating product
 * S'_i = S'_{i−1}·(n_i − d_i) div n_i in ppm (S'_0 = 10⁶) — the same
 * no-closed-form argument as C144's EWMA, so the product is an explicit
 * fold, replayed step-for-step by the oracle's recursive CTE.
 *
 * Overflow contract: the step multiplies S' ≤ 10⁶ by (n_i − d_i) < N,
 * so the fold is safe to N < 2⁶³/10⁶ ≈ 9·10¹² subjects.
 *
 * Scale shape — the C115/C144 discipline: one scan reduces the subject
 * frame to the DISTINCT-DURATION frame (events + censored per
 * duration); the at-risk counts are one cumulative window on that
 * value-domain-sized frame; the fold walks only the EVENT-time rows
 * (survival changes nowhere else) collected into one bounded array.
 */
object Survival {

  /** @param subjects one row per subject.
    * @param durationCol integer observed duration (time bucket).
    * @param eventCol true/1 = the terminal event was OBSERVED at
    *                 duration's end; false/0 = censored (still active —
    *                 at risk through its duration).
    * @return one row per event time: (t, n_risk, n_events, n_censored,
    *         surv_ppm) — n_censored = censorings AT that time. */
  def kaplanMeier(subjects: DataFrame, durationCol: Column,
                  eventCol: Column): DataFrame = {
    val byT = subjects
      .select(durationCol.cast("long").as("t"),
        when(eventCol.cast("boolean"), 1L).otherwise(0L).as("ev"))
      .groupBy("t")
      .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
    val wBelow = Window.partitionBy(lit(1)).orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(lit(1))
    val risked = byT
      .withColumn("n_risk",
        sum(col("d") + col("c")).over(wAll) -
          coalesce(sum(col("d") + col("c")).over(wBelow), lit(0L)))
      .filter(col("d") >= 1)
    risked
      .groupBy(lit(1).as("__g"))
      .agg(sort_array(collect_list(struct(col("t"), col("n_risk"),
        col("d"), col("c")))).as("arr"))
      .select(explode(expr(
        """aggregate(
          |  arr,
          |  named_struct('sp', CAST(1000000 AS BIGINT),
          |    'out', CAST(array() AS ARRAY<STRUCT<t: BIGINT, n_risk: BIGINT,
          |      n_events: BIGINT, n_censored: BIGINT, surv_ppm: BIGINT>>)),
          |  (acc, e) -> named_struct(
          |    'sp', acc.sp * (e.n_risk - e.d) div e.n_risk,
          |    'out', array_append(acc.out, named_struct(
          |      't', e.t, 'n_risk', e.n_risk, 'n_events', e.d,
          |      'n_censored', e.c,
          |      'surv_ppm', acc.sp * (e.n_risk - e.d) div e.n_risk))),
          |  acc -> acc.out)""".stripMargin)).as("p"))
      .select(col("p.t"), col("p.n_risk"), col("p.n_events"),
        col("p.n_censored"), col("p.surv_ppm"))
  }
}
