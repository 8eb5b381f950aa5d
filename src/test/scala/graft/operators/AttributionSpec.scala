package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** B47: U-shaped credit must conserve exactly 10⁶ ppm per conversion, honor
  * the lookback and the first-subsequent-conversion ownership rule. */
class AttributionSpec extends SparkSuite {
  import spark.implicits._

  test("B47: hand fixture — ownership, lookback, U-split, remainders") {
    // user 1: three touches then a 1000-cent purchase; a fourth touch AFTER
    // the purchase belongs to no conversion; user 2: one stale touch
    // outside the lookback; user 3: exactly two touches → 50/50
    val touches = Seq(
      (101L, 1L, "view", 100L), (102L, 1L, "click", 200L), (103L, 1L, "view", 300L),
      (104L, 1L, "click", 9000L), // after the purchase — orphan
      (201L, 2L, "view", 0L),     // conv at 20_000: gap > lookback 10_000
      (301L, 3L, "view", 50L), (302L, 3L, "click", 60L)
    ).toDF("event_id", "user_id", "channel", "ts_us")
    val conv = Seq(
      (1L, 1000L, 11L, 1000L), (2L, 20000L, 22L, 500L), (3L, 100L, 33L, 999L)
    ).toDF("user_id", "conv_ts", "conv_id", "value_cents")

    val got = Attribution.positionBased(touches, conv, lookbackUs = 10000L)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    // user 1: view@100 first (400000 → 400c), click@200 middle
    // (200000 div 1 = 200000 → 200c), view@300 last (400000 + 0 → 400c);
    // user 3: view first 500000 → 499c (truncation), click last 500000 → 499c
    assert(got == Seq(
      ("click", "last", 1L, 500000L, 499L),
      ("click", "middle", 1L, 200000L, 200L),
      ("view", "first", 2L, 900000L, 899L),
      ("view", "last", 1L, 400000L, 400L)))
  }

  test("B47: credit conserves 1e6 ppm per conversion on the real events") {
    val t = graft.queries.Tables(spark, sfDir)
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"), col("event_type").as("channel"), col("ts_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us")
      .agg(max(col("event_id")).as("conv_id"), lit(100L).as("value_cents"))
      .select(col("user_id"), col("ts_us").as("conv_ts"), col("conv_id"), col("value_cents"))
    // the invariant holds on the OPERATOR's own per-touch frame — not a
    // re-implementation of its credit chain
    val credits = Attribution.positionBasedCredits(touches, conv,
      lookbackUs = 7L * 86400000000L)
    val bad = credits
      .groupBy("c_conv_id").agg(sum(col("credit_ppm")).as("total"))
      .filter(col("total") =!= 1000000L)
    assert(bad.count() == 0, "every credited conversion must sum to exactly 1e6 ppm")
    assert(credits.count() > 0, "fixture must actually credit something")
  }

  test("B52: time-decay — halving per half-life, remainder to the newest, conservation") {
    // conversion at 5001 (ownership is STRICTLY-before): touches sit 3,
    // 2, 1, 0 whole half-lives (1000 us) back → raw weights 125000,
    // 250000, 500000, 1000000 (Σ 1875000); credits 10⁶·w div Σ
    // truncating = 66666, 133333, 266666, 533333 (Σ 999998) with the
    // +2 remainder on the newest touch.
    val touches = Seq(
      (1L, 1L, "a", 2000L), (2L, 1L, "b", 3000L),
      (3L, 1L, "c", 4000L), (4L, 1L, "d", 5000L)
    ).toDF("event_id", "user_id", "channel", "ts_us")
    val conv = Seq((1L, 5001L, 9L, 10000L))
      .toDF("user_id", "conv_ts", "conv_id", "value_cents")
    val got = Attribution.timeDecayCredits(touches, conv,
        lookbackUs = 100000L, halflifeUs = 1000L)
      .select("channel", "half_lives", "wgt", "credit_ppm")
      .as[(String, Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      ("d", 0L, 1000000L, 533333L + 2L),
      ("c", 1L, 500000L, 266666L),
      ("b", 2L, 250000L, 133333L),
      ("a", 3L, 125000L, 66666L)))
    assert(got.map(_._4).sum == 1000000L, "conservation")

    // deep-past touches floor at weight 1 (the 19-half-life cap), never 0
    val old = Seq((1L, 1L, "x", 0L), (2L, 1L, "y", 99000L))
      .toDF("event_id", "user_id", "channel", "ts_us")
    val oc = Seq((1L, 100000L, 9L, 100L))
      .toDF("user_id", "conv_ts", "conv_id", "value_cents")
    val g2 = Attribution.timeDecayCredits(old, oc,
        lookbackUs = 1000000L, halflifeUs = 1000L)
      .select("channel", "wgt", "credit_ppm")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(g2("x")._1 == 1L, "100 half-lives past caps to the floor weight 1")
    assert(g2("x")._2 >= 0L && g2("y")._2 > 990000L)
    assert(g2.values.map(_._2).sum == 1000000L)
  }

  // ------------------------------------------------------------- B53 Markov

  private def ev(user: Long, seq: String*): Seq[(Long, Long, Long, String)] =
    seq.zipWithIndex.map { case (ch, i) => (user, i.toLong + 1, user * 100 + i, ch) }

  test("B53: removal effects match the analytic absorption probabilities") {
    // journeys: A->conv x2, B->conv, B->null, C->null
    // base P = (2*10^6 + 2*5*10^5 + 0) / 5 = 600000
    // remove A -> 200000 (effect 400000); remove B -> 400000 (effect
    // 200000); remove C -> 600000 (effect 0); shares 2/3, 1/3, 0
    val rows = ev(1, "A", "purchase") ++ ev(2, "A", "purchase") ++
      ev(3, "B") ++ ev(4, "B", "purchase") ++ ev(5, "C")
    val got = Attribution.markovRemoval(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 2L, 600000L, 200000L, 400000L, Some(666666L))), s"${got("A")}")
    assert(got("B") == (("B", 2L, 600000L, 400000L, 200000L, Some(333333L))), s"${got("B")}")
    assert(got("C") == (("C", 1L, 600000L, 600000L, 0L, Some(0L))), s"${got("C")}")
  }

  test("B53: journeys split at conversions; post-purchase events start fresh") {
    // u1: A, purchase, B  -> journeys [A, CONV] and [B -> NULL]
    // u2: purchase        -> START -> CONV directly
    val rows = ev(1, "A", "purchase", "B") ++ ev(2, "purchase")
    val tr = Attribution.markovTransitions(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(tr == Map(
      ("START", "A") -> 1L, ("A", "CONV") -> 1L,
      ("START", "B") -> 1L, ("B", "NULL") -> 1L,
      ("START", "CONV") -> 1L), s"$tr")
    // cycles converge: A -> A -> ... -> conv keeps P exact within 32 sweeps
    val cyc = ev(7, "A", "A", "A", "purchase")
    val gotCyc = Attribution.markovRemoval(
        cyc.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    // chain: START->A, A->A (2/3), A->CONV (1/3): v(A) solves
    // v = (2v + 10^6)/3 -> v = 10^6; 32 truncating sweeps approach it
    // from below but must land within 0.1% of the fixed point
    val pBase = gotCyc.head._3
    assert(pBase > 999000L && pBase <= 1000000L, s"cycle absorption: $pBase")
    // removing the only channel kills every conversion through it
    assert(gotCyc.head._4 == 0L && gotCyc.head._6 == Some(1000000L))
  }

  test("B53: no conversions anywhere -> zero base, NULL attribution shares") {
    val rows = ev(1, "A", "B") ++ ev(2, "B")
    val got = Attribution.markovRemoval(
        rows.toDF("user_id", "ts", "event_id", "event_type"),
        "user_id", "event_type", "ts", "event_id", "purchase")
      .as[(String, Long, Long, Long, Long, Option[Long])].collect()
    assert(got.forall(r => r._3 == 0L && r._5 == 0L && r._6.isEmpty), s"${got.toSeq}")
  }
}
