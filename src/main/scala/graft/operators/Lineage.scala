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
}
