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

  private lazy val fwd = AsOf.joinForward(left, right, "k", "t", "rt", Seq("rt", "tag"))
    .select("id", "asof_rt", "asof_tag")
    .collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2))))).toMap

  test("forward: picks the earliest strictly-after right row; equal ts excluded") {
    assert(fwd(5L) == Some((90L, "a")), "t=50 sees the first right row")
    assert(fwd(1L) == Some((200L, "b")))
    assert(fwd(2L) == Some((300L, "c")))
    assert(fwd(3L) == None, "t=300 must not see the rt=300 row (strict >)")
    assert(fwd(4L) == None, "key with no right rows")
  }

  test("nearest: closer side wins, ties go prior, one-sided rows fall back") {
    val near = AsOf.joinNearest(left, right, "k", "t", "rt", Seq("rt", "tag"))
      .select("id", "asof_rt", "asof_tag")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2))))).toMap
    assert(near(1L) == Some((90L, "a")), "t=100: prior at 90 (d=10) beats forward at 200 (d=100)")
    assert(near(2L) == Some((200L, "b")), "t=205: prior d=5 beats forward d=95")
    assert(near(3L) == Some((200L, "b")), "t=300: the rt=300 row is excluded on BOTH sides")
    assert(near(4L) == None, "no right rows at all")
    assert(near(5L) == Some((90L, "a")), "no prior: forward fallback")
    // explicit tie: prior wins
    val l2 = Seq((9L, 10L, 100L)).toDF("id", "k", "t")
    val r2 = Seq((10L, 90L, "p"), (10L, 110L, "f")).toDF("k", "rt", "tag")
    val tie = AsOf.joinNearest(l2, r2, "k", "t", "rt", Seq("tag"))
      .select("asof_tag").collect()(0).getString(0)
    assert(tie == "p", "equidistant: prior side wins by convention")
  }
}
