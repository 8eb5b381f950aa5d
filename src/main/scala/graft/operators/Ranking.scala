package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Two-level distributed ranking — the template behind every "rank inside
 * a group that may be 100 TB wide" operator here (C60 shard layout, C62
 * suffix ranks, C74 prototypes, A35 equi-depth): a naive
 * `Window.partitionBy(group).orderBy(score)` funnels each group through
 * ONE task; instead, rows land in value-ordered BUCKETS (a monotone
 * function of the sort key), rank locally per (group, bucket), and add
 * the broadcast cumulated bucket offsets. Exactly equal to the global
 * window because equal keys share a bucket (ties break locally) and
 * different buckets are key-ordered by construction.
 */
object Ranking {

  /** DESC rank of `scoreCol` within `groupCol` (ties by `tieCol` ASC),
    * computed two-level via `buckets` — REQUIRED monotone non-decreasing
    * in the score (equal scores ⇒ equal bucket). Appends `rank` (1-based)
    * and `n_group`. */
  def groupRankDesc(df: DataFrame, groupCol: String, scoreCol: String,
                    tieCol: String, buckets: Column): DataFrame = {
    // the bucketed frame feeds BOTH the offsets aggregation and the
    // local-rank branch — without a persist the caller's whole scoring
    // pipeline is evaluated twice (q245's pair expansion + decimal lift
    // ran once per branch); lazy persist = the shared-subplan discipline
    val bucketed = df.withColumn("__bkt", buckets).persist()
    val wLocal = Window.partitionBy(groupCol, "__bkt")
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val wBuckets = Window.partitionBy(groupCol).orderBy(col("__bkt").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(groupCol, "__bkt").agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(wBuckets), lit(0L)))
      .withColumn("__n",
        sum(col("__bn")).over(Window.partitionBy(groupCol)))
      .select(groupCol, "__bkt", "__off", "__n")
    bucketed.withColumn("__lrk", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq(groupCol, "__bkt"))
      .withColumn("rank", col("__off") + col("__lrk"))
      .withColumn("n_group", col("__n"))
      .drop("__bkt", "__lrk", "__off", "__n")
  }
}
