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
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    val for1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(for1.head._3 == 2L, s"exclusive partner ranks first: ${for1.toSeq}")
    assert(!got.exists(r => r._1 == 1L && r._3 == 7L), "below-floor pair excluded")
    assert(got.groupBy(_._1).values.forall(_.length <= 2), "k binds")
    // the recommendation relation is symmetric on this fixture's counts
    assert(got.exists(r => r._1 == 2L && r._3 == 1L))
  }
}
