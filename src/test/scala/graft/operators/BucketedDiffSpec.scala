package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import java.nio.file.Files

/** The 100 TB snapshot-diff contract (SURVEY §5): when both snapshots are
  * written bucketed+sorted by the key, the full-outer diff join plans as a
  * ZERO-SHUFFLE sort-merge — no Exchange on either side — so steady-state
  * CDC cost is a co-partitioned streaming merge, not a re-shuffle of both
  * snapshots. */
class BucketedDiffSpec extends SparkSuite {
  import spark.implicits._

  private val nBuckets = 4

  private lazy val setup: Unit = {
    val dir = Files.createTempDirectory("graft_bucketdemo").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '$dir'")
    val curr = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (5L, "e", 50.0))
      .toDF("k", "name", "v")
    val prev = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 40.0))
      .toDF("k", "name", "v")
    curr.write.mode("overwrite").bucketBy(nBuckets, "k").sortBy("k")
      .saveAsTable("bucketdemo.snap_curr")
    prev.write.mode("overwrite").bucketBy(nBuckets, "k").sortBy("k")
      .saveAsTable("bucketdemo.snap_prev")
  }

  private lazy val diff = {
    setup
    Diff.snapshotDiff(
      spark.table("bucketdemo.snap_curr"),
      spark.table("bucketdemo.snap_prev"),
      keyCols = Seq("k"))
  }

  test("bucketed snapshots diff with ZERO exchanges (co-partitioned SMJ)") {
    val p = diff.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), s"bucketed diff must not shuffle:\n$p")
  }

  test("maintainJoin equals the one-shot recompute; every non-view side broadcasts") {
    import org.apache.spark.sql.functions._
    // fact history + delta + a deletion; dim with one changed key
    val hist = Seq((1L, 10L, 5.0), (2L, 20L, 6.0), (3L, 10L, 7.0), (4L, 30L, 8.0))
      .toDF("fk", "dk", "v")
    val delta = Seq((4L, 30L, 9.5), (5L, 20L, 1.0)).toDF("fk", "dk", "v") // update + insert
    val deleted = Seq(2L).toDF("fk")
    val dimNew = Seq((10L, "ten_v2"), (20L, "twenty"), (30L, "thirty"))
      .toDF("dk", "name")
    val dimOld = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("dk", "name")
    val changed = Seq(10L).toDF("dk")
    val oldView = hist.join(dimOld, Seq("dk"), "left")
    val got = Diff.maintainJoin(oldView, delta, deleted, dimNew, changed,
      factKey = "fk", dimKey = "dk")
      .select("fk", "dk", "v", "name").as[(Long, Long, Double, String)]
      .collect().toSet
    // one-shot: (hist minus deleted minus delta-touched) + delta, against dimNew
    val want = Set(
      (1L, 10L, 5.0, "ten_v2"),   // dim-stale row re-enriched
      (3L, 10L, 7.0, "ten_v2"),
      (4L, 30L, 9.5, "thirty"),   // delta update wins
      (5L, 20L, 1.0, "twenty"))   // delta insert
    assert(got == want, s"got $got")
    // plan: the only non-broadcast join work rides the VIEW; all delta/dim
    // sides broadcast (4 broadcast joins: anti, anti, semi+left, left)
    val p = Diff.maintainJoin(oldView, delta, deleted, dimNew, changed, "fk", "dk")
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case other => other.toString
    }
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(p).size >= 4, p)
    assert(!p.contains("SortMergeJoin"), "no view-wide shuffle join anywhere")
  }

  test("bucketed diff classifies insert/update/delete exactly") {
    val got = diff.select("k", Diff.ChangeCol)
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "insert", 5L -> "insert", 4L -> "delete"))
  }
}
