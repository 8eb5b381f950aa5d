package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed sweep-line — the interval-analytics sibling of
 * [[Ranking]]'s two-level rank: a GLOBAL time-ordered running sum over
 * boundary rows (+1 at interval open, −1 at close) without ever funneling
 * the whole timeline through one window task.
 *
 * Rows land in time-ordered BUCKETS (a monotone function of the sort key —
 * here typically the day), the running sum is computed locally per bucket,
 * and the broadcast cumulated per-bucket totals supply each bucket's
 * carry-in. Exactly equal to the one global window because equal sort keys
 * share a bucket and buckets partition the time axis in order. At 100 TB
 * the boundary frame shuffles once on the bucket and the offsets frame is
 * one row per bucket (days/hours — thousands, broadcastable).
 */
object Sweep {

  /** Appends `running` — the inclusive prefix sum of `deltaCol` in the
    * total order (`orderCols`, all ASC) — and `__bkt` (the bucket).
    * `bucket` MUST be monotone non-decreasing in that order (equal keys ⇒
    * equal bucket). */
  def runningSum(df: DataFrame, bucket: Column, orderCols: Seq[String],
                 deltaCol: String): DataFrame = {
    val b = df.withColumn("__bkt", bucket).withColumn("__g", lit(1))
    val wLocal = Window.partitionBy("__bkt")
      .orderBy(orderCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // one row per bucket — tiny; partitioned by the literal group so the
    // plan never carries an unpartitioned WindowExec
    val wOff = Window.partitionBy("__g").orderBy(col("__bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = b.groupBy("__g", "__bkt").agg(sum(col(deltaCol)).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(wOff), lit(0L)))
      .select("__bkt", "__off")
    b.withColumn("__lsum", sum(col(deltaCol)).over(wLocal))
      .join(broadcast(offsets), Seq("__bkt"))
      .withColumn("running", col("__off") + col("__lsum"))
      .drop("__lsum", "__g", "__off")
  }
}
