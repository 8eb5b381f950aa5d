package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C139: rules must match hand-computed support/confidence/lift, respect
  * the apriori prune, and emit both directions with direction-correct
  * confidence but direction-invariant lift. */
class AssociationsSpec extends SparkSuite {
  import spark.implicits._

  // 10 baskets: a+b in 4, b alone in 3, a alone in 1, c+d once (rare)
  private val rows: Seq[(Long, String)] =
    (1L to 4L).flatMap(k => Seq(k -> "a", k -> "b")) ++
    (5L to 7L).map(k => k -> "b") ++
    Seq(8L -> "a") ++
    Seq(9L -> "c", 9L -> "d") ++
    Seq(10L -> "e")

  private def run(minSupport: Long) =
    Associations.pairRules(rows.toDF("basket", "item"), "basket", "item",
        minSupport = minSupport)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap

  test("C139: support/confidence/lift match hand computation in both directions") {
    val got = run(2L)
    // a: 5 baskets, b: 7 baskets, a∧b: 4 of 10
    val ab = got(("a", "b"))
    assert(ab._3 == 4L && ab._4 == 5L && ab._5 == 7L)
    assert(ab._6 == 400000L, s"support: $ab")          // 4/10
    assert(ab._7 == 800000L, s"conf a=>b: $ab")        // 4/5
    assert(ab._8 == 1000L * 4 * 10 / (5 * 7), s"lift: $ab") // 1142‰
    val ba = got(("b", "a"))
    assert(ba._7 == 1000000L * 4 / 7, s"conf b=>a: $ba")
    assert(ba._8 == ab._8, "lift is direction-invariant")
    assert(ba._6 == ab._6, "support is direction-invariant")
  }

  test("C139: apriori prune — a pair of rare items never survives; thresholds bind") {
    val got2 = run(2L)
    assert(!got2.contains(("c", "d")), "c/d appear once — below minSupport 2")
    val got5 = run(5L)
    assert(got5.isEmpty, "no pair reaches 5 baskets")
    // confidence threshold drops only the weak direction
    val conf = Associations.pairRules(rows.toDF("basket", "item"), "basket", "item",
        minSupport = 2L, minConfPm = 700000L)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2)).toSet
    assert(conf == Set(("a", "b")), s"only conf >= 70% survives: $conf")
  }

  test("C139: duplicate (basket, item) rows do not inflate counts") {
    val dup = rows ++ Seq(1L -> "a", 1L -> "a", 4L -> "b")
    val got = Associations.pairRules(dup.toDF("basket", "item"), "basket", "item",
        minSupport = 2L)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")) == 4L)
  }

  // --- C146: sequential rules ------------------------------------------

  private def runSeq(rows: Seq[(Long, String, Long)], minSupport: Long) =
    Associations.sequenceRules(rows.toDF("session", "item", "ts"),
        "session", "item", "ts", minSupport)
      .as[(String, String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r).toMap

  test("C146: direction counts differ; strict before; counted once per session") {
    // s1: a(1) b(5)           — a→b only
    // s2: a(1) b(5) a(9)      — a→b AND b→a, each once
    // s3: b(1) a(5)           — b→a only
    // s4: a(1) a(2)           — same item, no pair
    val rows = Seq(
      (1L, "a", 1L), (1L, "b", 5L),
      (2L, "a", 1L), (2L, "b", 5L), (2L, "a", 9L),
      (3L, "b", 1L), (3L, "a", 5L),
      (4L, "a", 1L), (4L, "a", 2L))
    val got = runSeq(rows, 1L)
    assert(got(("a", "b"))._3 == 2L, "a=>b in s1 and s2 only")
    assert(got(("b", "a"))._3 == 2L, "b=>a in s2 and s3 only")
    // bases: a in 4 sessions, b in 3; N = 4
    assert(got(("a", "b"))._4 == 4L && got(("a", "b"))._5 == 3L)
    assert(got(("a", "b"))._6 == 500000L, "support 2/4")
    assert(got(("a", "b"))._7 == 500000L, "conf 2/4")
    assert(got(("b", "a"))._7 == 1000000L * 2 / 3, "conf 2/3")
    // lift a=>b: 1000·2·4/(4·3) = 666
    assert(got(("a", "b"))._8 == 666L)
  }

  test("C146: simultaneous-only co-occurrence is not a sequence; prune binds") {
    val rows = Seq((1L, "x", 5L), (1L, "y", 5L), (2L, "x", 3L), (2L, "y", 3L))
    assert(runSeq(rows, 1L).isEmpty, "equal timestamps are not 'before'")
    val planted = Seq((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 1L), (2L, "d", 2L),
      (3L, "a", 1L), (3L, "b", 2L))
    val got = runSeq(planted, 2L)
    assert(got.keySet == Set(("a", "b")), "c/d below support die in the prune")
  }
}
