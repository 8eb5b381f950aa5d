package graft.operators

import graft.SparkSuite

/** A37 — path-doubling hierarchical closure. */
class HierarchySpec extends SparkSuite {
  import spark.implicits._

  test("ancestors closes a known forest with exact depths; self-loops rejected as edges") {
    // forest:  1→0, 2→0, 3→1, 4→1, 5→3  (and a 0→0 self-loop to ignore)
    val edges = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 3L))
      .toDF("child", "parent")
    val got = Hierarchy.ancestors(edges, "child", "parent")
      .as[(Long, Long, Long)].collect().toSet
    val want = Set(
      (1L, 0L, 1L), (2L, 0L, 1L), (3L, 1L, 1L), (4L, 1L, 1L), (5L, 3L, 1L),
      (3L, 0L, 2L), (4L, 0L, 2L), (5L, 1L, 2L),
      (5L, 0L, 3L))
    assert(got == want, s"got $got")
  }

  test("deep chain closes in logarithmic rounds (path doubling, not depth self-joins)") {
    // a 200-deep chain: maxIter 9 suffices only if rounds double coverage
    val edges = (1L to 200L).map(i => (i, i - 1)).toDF("child", "parent")
    val got = Hierarchy.ancestors(edges, "child", "parent", maxIter = 9)
    assert(got.count() == (1L to 200L).map(identity).sum) // node i has i ancestors
    val deepest = got.filter(org.apache.spark.sql.functions.col("depth") === 200L).count()
    assert(deepest == 1L, "only node 200 reaches depth 200")
  }
}
