package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** B54: item-to-item recommendations must equal a brute lift replay,
  * respect the co-occurrence floor and k, and rank exclusive
  * affinities above mega-seller noise. */
class RecommendSpec extends SparkSuite {
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long)], minPair: Long, k: Int): Seq[(Long, Long, Long, Long)] = {
    val bi = rows.distinct
    val n = bi.map(_._1).distinct.size.toLong
    val cnt = bi.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val byB = bi.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val pairs = byB.values.flatMap(is => for (a <- is; b <- is if a != b) yield (a, b))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minPair)
    pairs.toSeq.map { case ((a, b), nab) =>
      val lift = (BigInt(1000000) * nab * n / (BigInt(cnt(a)) * cnt(b))).toLong
      (a, b, nab, lift)
    }.groupBy(_._1).toSeq.flatMap { case (a, cands) =>
      cands.sortBy(c => (-c._4, -c._3, c._2)).take(k).zipWithIndex
        .map { case ((_, b, nab, lift), i) => (a, i.toLong + 1, b, lift) }
    }
  }

  test("B54: equals the brute lift replay on a random basket fixture (with ties)") {
    val rnd = new scala.util.Random(59)
    val rows = Seq.fill(600)((rnd.nextInt(80).toLong, rnd.nextInt(25).toLong))
    val got = Recommend.itemToItem(rows.toDF("basket", "item"), "basket", "item",
        minPair = 2L, k = 3)
      .select("item", "rank", "rec", "lift_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = brute(rows, 2L, 3).toSet
    assert(got == want, s"${got.size} vs ${want.size}; sample diff: ${got.diff(want).take(3)}")
  }

  test("B54: exclusive affinity outranks the mega-seller; floor and k bind") {
    // item 1 co-occurs with 2 EXCLUSIVELY (3 baskets); the mega-seller 9
    // appears in every basket, so its lift with anything is ~1
    val rows =
      (1L to 3L).flatMap(b => Seq((b, 1L), (b, 2L), (b, 9L))) ++
      (4L to 12L).flatMap(b => Seq((b, 9L), (b, b % 3 + 3))) ++
      Seq((13L, 1L), (13L, 7L)) // pair (1,7) occurs ONCE: under the floor
    val got = Recommend.itemToItem(rows.toDF("basket", "item"), "basket", "item",
        minPair = 2L, k = 2)
      .select("item", "rank", "rec", "n_ab", "n_item", "n_rec", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val for1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(for1.head._3 == 2L, s"exclusive partner ranks first: ${for1.toSeq}")
    assert(!got.exists(r => r._1 == 1L && r._3 == 7L), "below-floor pair excluded")
    assert(got.groupBy(_._1).values.forall(_.length <= 2), "k binds")
    // the recommendation relation is symmetric on this fixture's counts
    assert(got.exists(r => r._1 == 2L && r._3 == 1L))
  }

  test("B54: a planted mega-basket is refused whole, exactly ledgered, and " +
       "the remaining counts are untouched") {
    val normal = Seq(
      (1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 10L), (3L, 12L),
      (4L, 11L), (4L, 12L), (5L, 10L), (5L, 11L))
    // basket 99: 12 distinct items (incl. 10/11 — refusing it must also
    // remove its contribution to their basket counts), with duplicates
    val mega = (0L until 12L).map(i => (99L, 10L + i)) :+ ((99L, 10L))
    val all = (normal ++ mega).toDF("basket", "item")
    val capped = Recommend.itemToItem(all, "basket", "item",
        minPair = 2L, k = 3, maxBasketSize = 8L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    // ledger: ONE refused basket, 12·11 directed pairs refused
    assert(capped.forall(r => r._8 == 1L && r._9 == 132L),
      s"ledger constants: ${capped.take(3).toSeq}")
    // the scored rows equal the uncapped run on the fixture WITHOUT the
    // mega basket — refusal is exclusion, not partial counting
    val want = Recommend.itemToItem(normal.toDF("basket", "item"),
        "basket", "item", minPair = 2L, k = 3)
      .select("item", "rank", "rec", "n_ab", "n_item", "n_rec", "lift_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(capped.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7)).toSet == want)
    // a zero ledger certifies exactness: uncapped == capped-with-huge-cap
    val wide = Recommend.itemToItem(all, "basket", "item",
        minPair = 2L, k = 3, maxBasketSize = 1024L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(wide.forall(r => r._8 == 0L && r._9 == 0L))
    // bounded expansion: with the cap, no pair row of the mega basket
    // survives (no rec pair is exclusive to basket 99)
    assert(!capped.exists(r => r._3 >= 14L || r._1 >= 14L),
      "mega-basket-only items must not appear in any candidate list")
  }
}
