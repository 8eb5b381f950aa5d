package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/**
 * Storage hygiene for iterative operators. Every round of the iterative
 * family (components, MSF, k-core/k-truss, LPA, Louvain, PageRank/PPR,
 * HITS, BFS/Bellman-Ford, suffix doubling) cuts lineage with an EAGER
 * `localCheckpoint`, which persists the round's frame as RDD storage
 * blocks. `Dataset.unpersist` only talks to the CacheManager (entries
 * registered by `persist()`/`cache()`) and is a SILENT NO-OP for
 * checkpoint RDDs, so "unpersist the superseded round" calls freed
 * nothing: dead rounds accumulated in executor storage until a JVM GC
 * let the ContextCleaner find them — storage pressure that grows with
 * round count and, in a multi-query session, with catalog position.
 */
object Lineage {

  /** Free the storage blocks behind an EAGERLY `localCheckpoint`ed frame
    * that nothing references anymore. Safe ONLY when every consumer of
    * the frame has already materialized (the checkpoint's lineage is
    * truncated — dropped blocks cannot be recomputed). A frame that was
    * never checkpointed (plan is not a bare LogicalRDD) is left alone. */
  def free(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: LogicalRDD => l.rdd.unpersist(blocking = false)
    case _ => ()
  }

  /** Eager `localCheckpoint` + carried-stats clamp — the lineage cut every
    * iterative round must use. `Dataset.localCheckpoint` preserves the
    * origin plan's ESTIMATED stats on the resulting LogicalRDD; with
    * Catalyst's join estimate being the product of child sizes, round-
    * over-round checkpoints compound the estimate double-exponentially
    * until the BigInteger arithmetic inside the NEXT checkpoint costs
    * minutes of driver CPU (q239@sf0.01 hung the whole r12 verify phase
    * there). The clamp (see [[org.apache.spark.sql.GraftStatsBridge]])
    * caps the carried value at Long.MaxValue — identical planning
    * behavior in every sane regime, bounded arithmetic in the insane one. */
  implicit final class LineageOps(private val df: DataFrame) extends AnyVal {
    def cut(): DataFrame =
      org.apache.spark.sql.GraftStatsBridge.clampCheckpointStats(
        df.localCheckpoint(eager = true))
  }
}
