package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * B50: RFM SEGMENTATION — the classic audience-activation scoring a
 * reverse-ETL pipeline ships to marketing tools (the operator behind
 * "sync the champions segment to the ad platform"): per customer,
 * Recency (days since last order, lower better), Frequency (orders),
 * Monetary (lifetime spend in cents), each quintile-scored 1–5 by exact
 * rank, composed into a deterministic segment label.
 *
 * Scoring contract (exact, both engines replay it): per dimension, rank
 * customers best-first (DESC by the dimension's "better" direction, id
 * ties) and score = 5 − (5·(rank−1)) div n — equal-POPULATION quintiles
 * by construction (the marketing convention), deterministic under ties.
 *
 * Scale shape: one orders scan reduces to the per-customer frame; the
 * three rankings run through [[Ranking.groupRankDesc]]'s two-level
 * bucketed template (value-derived buckets, monotone with the score by
 * trunc-division) so no dimension funnels the whole customer frame
 * through one window task; the reference date is a 1-row broadcast.
 */
object Rfm {

  /** Equal-population 1–5 score by descending `s` (higher = better),
    * deterministic `cust` ties, two-level bucketed rank. */
  private def quintile(base: DataFrame, s: Column, bucketW: Long,
                       out: String): DataFrame =
    Ranking.groupRankDesc(
        base.select(col("cust"), s.cast("long").as("__s"))
          .withColumn("__g", lit(1)),
        "__g", "__s", "cust", expr(s"__s div ${bucketW}L"))
      .select(col("cust"),
        (lit(5L) - expr("(5 * (rank - 1)) div n_group")).as(out))

  /** @param orders      order facts.
    * @param custCol     customer key column name.
    * @param dateCol     order DATE column (cast timestamps to date at
    *                    the call site — recency is day-granular).
    * @param amountCents exact integer order amount (cents).
    * @return one row per customer with ≥1 order: (cust, rec_days, freq,
    *         mon_cents, r_score, f_score, m_score, rfm, segment) —
    *         recency measured against the corpus max order date. */
  def rfmScores(orders: DataFrame, custCol: String, dateCol: Column,
                amountCents: Column): DataFrame = {
    val per = orders.groupBy(col(custCol).as("cust"))
      .agg(max(dateCol).as("last_d"), count(lit(1)).as("freq"),
        sum(amountCents).cast("long").as("mon_cents"))
    val ref = per.agg(max(col("last_d")).as("ref_d"))
    val base = per.crossJoin(broadcast(ref))
      .withColumn("rec_days", datediff(col("ref_d"), col("last_d")).cast("long"))
      .select("cust", "rec_days", "freq", "mon_cents")
    val scored = base
      .join(quintile(base, -col("rec_days"), 8L, "r_score"), Seq("cust"))
      .join(quintile(base, col("freq"), 4L, "f_score"), Seq("cust"))
      .join(quintile(base, col("mon_cents"), 10000000L, "m_score"), Seq("cust"))
    scored
      .withColumn("rfm", concat(col("r_score").cast("string"),
        col("f_score").cast("string"), col("m_score").cast("string")))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 && col("m_score") >= 4, "champion")
          .when(col("f_score") >= 4, "loyal")
          .when(col("r_score") <= 2 && (col("f_score") >= 3 || col("m_score") >= 3), "at_risk")
          .when(col("r_score") <= 2, "hibernating")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
          .otherwise("regular"))
  }
}
