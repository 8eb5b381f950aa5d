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

  test("bucketed diff classifies insert/update/delete exactly") {
    val got = diff.select("k", Diff.ChangeCol)
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "update", 3L -> "insert", 5L -> "insert", 4L -> "delete"))
  }
}
