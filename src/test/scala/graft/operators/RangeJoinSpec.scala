package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Binned range join: result-equivalence with the naive inequality join,
  * boundary semantics, and the plan guarantee (equi-join, no nested loop). */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val points = (0L to 1000L by 7).map(t => (t, s"p$t")).toDF("t", "pname")
  private lazy val intervals = Seq(
    (1L, 0L, 100L), (2L, 50L, 250L), (3L, 240L, 241L), (4L, 900L, 2000L)
  ).toDF("iid", "s", "e")

  test("binned range join equals the naive inequality join for any bin size") {
    val naive = points.join(intervals, col("t") >= col("s") && col("t") < col("e"))
      .select("pname", "iid")
    for (bin <- Seq(1L, 64L, 100L, 1000L)) {
      val binned = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", bin)
        .select("pname", "iid")
      assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
        s"bin=$bin differs from naive")
    }
  }

  test("interval end is exclusive, start inclusive") {
    val got = RangeJoin.pointInInterval(
      Seq((100L, "x"), (0L, "y")).toDF("t", "pname"), intervals, "t", "s", "e", 10)
      .select("pname", "iid").as[(String, Long)].collect().toSet
    assert(got.contains(("y", 1L)), "t=0 is inside [0,100)")
    assert(!got.contains(("x", 1L)), "t=100 is outside [0,100)")
    assert(got.contains(("x", 2L)), "t=100 is inside [50,250)")
  }

  test("plans as an equi-join on the bin key, never a nested loop") {
    val p = RangeJoin.pointInInterval(points, intervals, "t", "s", "e", 64)
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join must not nested-loop:\n$p")
  }
}
