package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C89: the fixed-point PageRank must reproduce a driver-side replay of the
  * damped rounds exactly, rank structure over a star must put the hub on
  * top, and total walk mass must stay ≈ N·scale (truncation-only loss). */
class RankSpec extends SparkSuite {
  import spark.implicits._

  private def replay(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val wt = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / wt(s) }.sum).toMap
      r = nodes.map(n => n -> (15L * 1000000000L + 85L * in.getOrElse(n, 0L)) / 100L).toMap
    }
    r
  }

  test("C89: matches the driver replay on an asymmetric weighted graph") {
    // 1↔2 heavy, 2↔3 light, 3→1 back-edge: every node has out-edges
    val edges = Seq((1L, 2L, 10L), (2L, 1L, 10L), (2L, 3L, 1L), (3L, 1L, 5L))
    val got = Rank.pageRank(edges.toDF("src", "dst", "w"), iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == replay(edges, 6))
  }

  test("C89: star hub dominates; mass is conserved up to truncation") {
    val leaves = (2L to 41L)
    val edges = leaves.map(l => (1L, l, 1L)) ++ leaves.map(l => (l, 1L, 1L))
    val got = Rank.pageRank(edges.toDF("src", "dst", "w"), iters = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == replay(edges, 6))
    val hub = got(1L)
    assert(leaves.forall(l => got(l) < hub), "hub must outrank every leaf")
    // damped-walk mass: Σr stays within rounding of N·scale (each node's
    // update truncates < 100 ppb per round, plus per-edge division loss)
    val total = got.values.sum
    val n = got.size
    assert(math.abs(total - n * 1000000000L) < n * 1000L,
      s"total mass $total vs ${n * 1000000000L}")
  }

  test("C89: q170 plan has no cartesian product") {
    val t = graft.queries.Tables(spark, sfDir)
    val df = graft.queries.TrainingData.q170PageRank(t)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "PageRank must join on keys")
  }
}
