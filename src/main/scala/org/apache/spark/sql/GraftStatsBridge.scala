package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Stats hygiene for eagerly `localCheckpoint`ed frames (placed in Spark's
 * `sql` package only for `Dataset.ofRows` access — no Spark internals are
 * modified).
 *
 * `Dataset.localCheckpoint` builds its `LogicalRDD` via
 * `LogicalRDD.fromDataset`, which PRESERVES the origin plan's estimated
 * `Statistics`. In Catalyst's default (size-only) estimation a join's
 * sizeInBytes is the PRODUCT of its children's, so in an iterative
 * operator (connected components, Borůvka MSF, PageRank…) the carried
 * estimate compounds: round k+1's estimate is a product of several round-k
 * estimates, i.e. the BigInt's BIT LENGTH grows geometrically with round
 * count. Two consequences at high round counts:
 *
 *  - `fromDataset` itself computes those stats eagerly, and multiplying
 *    million-bit BigIntegers (Toom-Cook) takes MINUTES of driver CPU —
 *    q239 (MSF → per-round components) at sf0.01 burned 980+ s inside
 *    `BigInteger.multiply` before being killed (the r12 driver's verify
 *    phase died exactly here: `entry_ok:false, n_queries:0`);
 *  - every later plan that references the frame re-enters the same
 *    arithmetic.
 *
 * The fix: after each eager checkpoint, clamp the carried estimate to
 * `Long.MaxValue` (and the row count likewise). Values at or above the
 * clamp are equivalent for every planning decision that reads them — any
 * threshold comparison (auto-broadcast, shuffled-hash eligibility) is
 * already far past its cutoff — so planning behavior only changes in the
 * regime where the estimate is astronomically wrong anyway; AQE re-plans
 * joins from RUNTIME sizes regardless. Constraints are preserved.
 */
object GraftStatsBridge {
  private val cap = BigInt(Long.MaxValue)

  /** Clamp an eagerly checkpointed frame's carried stats; frames whose
    * plan is not a bare LogicalRDD, or whose stats are already sane, pass
    * through untouched. */
  def clampCheckpointStats(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case l: LogicalRDD =>
        val s = l.stats
        if (s.sizeInBytes <= cap && s.rowCount.forall(_ <= cap)) df
        else {
          val clamped = Statistics(
            sizeInBytes = s.sizeInBytes.min(cap),
            rowCount = s.rowCount.map(_.min(cap)))
          val spark = df.sparkSession.asInstanceOf[CSparkSession]
          CDataset.ofRows(spark, LogicalRDD(
            l.output, l.rdd, l.outputPartitioning, l.outputOrdering,
            l.isStreaming, l.stream)(spark, Some(clamped), Some(l.constraints)))
        }
      case _ => df
    }
}
