package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Storage hygiene of the iterative family: superseded per-round
  * checkpoints must be freed as the loop advances ([[Lineage.free]] —
  * `Dataset.unpersist` is a CacheManager no-op for checkpoint RDDs), so
  * the persistent-RDD census after a many-round run stays bounded
  * instead of growing with round count. */
class LineageSpec extends SparkSuite {
  import spark.implicits._

  private def census(): Int = spark.sparkContext.getPersistentRDDs.size

  test("components on a long path frees superseded round checkpoints") {
    // diameter-40 path ⇒ several pointer-doubling rounds actually run
    val edges = (0L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val before = census()
    val out = Graph.components(edges, rounds = 8)
    out.write.format("noop").mode("overwrite").save()
    // live frames: the symmetrized edge checkpoint + the final label
    // checkpoint (+ nothing per superseded round). A small fixed bound —
    // NOT a function of rounds — is the contract.
    val after = census()
    assert(after - before <= 3,
      s"components leaked round checkpoints: census grew $before -> $after")
    assert(out.count() == 41)
  }

  test("pageRank frees superseded rank rounds") {
    val edges = (0L until 30L).map(i => (i, (i + 7) % 30, 1L)).toDF("src", "dst", "w")
    val before = census()
    val out = Rank.pageRank(edges, iters = 6)
    out.write.format("noop").mode("overwrite").save()
    val after = census()
    assert(after - before <= 4,
      s"pageRank leaked round checkpoints: census grew $before -> $after")
    assert(out.count() == 30)
  }
}
