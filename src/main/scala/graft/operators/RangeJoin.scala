package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Point-in-interval range join via time binning.
 *
 * Spark plans an inequality-only join (`p.ts >= i.start AND p.ts < i.end`)
 * as BroadcastNestedLoopJoin — |points| × |intervals| comparisons, which
 * is exactly what must not happen at 100 TB. Binning restores an
 * equi-join: every point keys by its time bin, every interval explodes to
 * the (few) bins it overlaps, the join runs on the bin key through the
 * normal hash/sort-merge machinery, and the exact predicate filters the
 * boundary bins. Cost: |points| + Σ(interval length / binSize) join keys.
 * Pick binSize near the median interval length (≤1 extra bin per
 * interval); wildly longer intervals just emit more bin rows — never a
 * cross product.
 */
object RangeJoin {

  /** Inner join of `points` (at `pointTs`) to `intervals` covering
    * [startCol, endCol). Times must be integral (epoch µs/ns/s). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, pointTs: String,
                      startCol: String, endCol: String, binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    val p = points.withColumn("__bin", expr(s"$pointTs div ${binSize}L"))
    val i = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div ${binSize}L"), expr(s"$endCol div ${binSize}L"))))
    p.join(i, "__bin")
      .filter(col(pointTs) >= col(startCol) && col(pointTs) < col(endCol))
      .drop("__bin")
  }
}
