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

  private val ruleCols = Seq("antecedent", "consequent", "pair_n", "ante_n",
    "cons_n", "support_ppm", "conf_ppm", "lift_pm")

  private def run(minSupport: Long) =
    Associations.pairRules(rows.toDF("basket", "item"), "basket", "item",
        minSupport = minSupport)
      .select(ruleCols.head, ruleCols.tail: _*)
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
      .select("antecedent", "consequent")
      .as[(String, String)]
      .collect().toSet
    assert(conf == Set(("a", "b")), s"only conf >= 70% survives: $conf")
  }

  test("C139: duplicate (basket, item) rows do not inflate counts") {
    val dup = rows ++ Seq(1L -> "a", 1L -> "a", 4L -> "b")
    val got = Associations.pairRules(dup.toDF("basket", "item"), "basket", "item",
        minSupport = 2L)
      .select("antecedent", "consequent", "pair_n")
      .as[(String, String, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("a", "b")) == 4L)
  }

  // --- C146: sequential rules ------------------------------------------

  private def runSeq(rows: Seq[(Long, String, Long)], minSupport: Long) =
    Associations.sequenceRules(rows.toDF("session", "item", "ts"),
        "session", "item", "ts", minSupport)
      .select(ruleCols.head, ruleCols.tail: _*)
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

  // --- the enforced group cap (PairExpansionGateSpec's class contract) ---

  test("C139/C146: oversized groups are refused whole and exactly ledgered") {
    // a mega-basket of 6 items above a cap of 4 — apriori would NOT
    // prune it (every item is frequent via the normal baskets)
    val mega = (1L to 6L).map(i => (99L, s"i$i"))
    val normal = (1L to 3L).flatMap(b => Seq((b, "i1"), (b, "i2")))
    val capped = Associations.pairRules((normal ++ mega).toDF("basket", "item"),
        "basket", "item", minSupport = 2L, maxBasketSize = 4L)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(capped.forall(r => r._9 == 1L && r._10 == 30L), // 6·5 directed
      s"pair-rules ledger: ${capped.take(2).toSeq}")
    // counts equal the run WITHOUT the mega basket (exclusion, not bias)
    val want = Associations.pairRules(normal.toDF("basket", "item"),
        "basket", "item", minSupport = 2L)
      .select(ruleCols.head, ruleCols.tail: _*)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(capped.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7, r._8)).toSet == want)

    // sequence rules: a 5-item mega-session refused under cap 3
    val megaSeq = (1L to 5L).map(i => (9L, s"s$i", i))
    val normSeq = (1L to 2L).flatMap(s => Seq((s, "s1", 1L), (s, "s2", 2L)))
    val cappedSeq = Associations.sequenceRules((normSeq ++ megaSeq)
        .toDF("session", "item", "ts"), "session", "item", "ts",
        minSupport = 2L, maxSessionSize = 3L)
      .as[(String, String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(cappedSeq.forall(r => r._9 == 1L && r._10 == 20L), // 5·4 directed
      s"sequence-rules ledger: ${cappedSeq.take(2).toSeq}")
    assert(cappedSeq.map(r => (r._1, r._2, r._3)).toSet == Set(("s1", "s2", 2L)))
  }
}
