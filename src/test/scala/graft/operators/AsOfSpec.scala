package graft.operators

import graft.SparkSuite

/** As-of join semantics on hand-built data: strictly-prior match, per-key
  * isolation, equal-timestamp exclusion, LEFT-join nulls. */
class AsOfSpec extends SparkSuite {
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, 100L), // key 1 at t=100
    (2L, 10L, 205L), // key 1 at t=205
    (3L, 10L, 300L), // key 1 at t=300 (equal to a right ts)
    (4L, 20L, 500L), // key 2 — no right rows at all
    (5L, 10L, 50L)   // key 1 before any right row
  ).toDF("id", "k", "t")

  private lazy val right = Seq(
    (10L, 90L, "a"),
    (10L, 200L, "b"),
    (10L, 300L, "c")
  ).toDF("k", "rt", "tag")

  private lazy val got = AsOf.joinPrior(left, right, "k", "t", "rt", Seq("rt", "tag"))
    .select("id", "asof_rt", "asof_tag")
    .collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2))))).toMap

  test("picks the most recent strictly-prior right row per key") {
    assert(got(1L) == Some((90L, "a")))
    assert(got(2L) == Some((200L, "b")))
  }

  test("equal timestamps are NOT prior (strict inequality)") {
    assert(got(3L) == Some((200L, "b")), "t=300 must not see the rt=300 row")
  }

  test("left rows with no prior match keep nulls (LEFT semantics)") {
    assert(got(4L) == None, "key with no right rows")
    assert(got(5L) == None, "left row before any right row")
  }

  test("row count equals the left side (never a join blow-up)") {
    assert(AsOf.joinPrior(left, right, "k", "t", "rt", Seq("tag")).count() == left.count())
  }
}
