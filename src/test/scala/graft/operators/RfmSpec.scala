package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._
import java.sql.Date

/** B50: RFM scores must equal a driver-side replay of the rank/quintile
  * contract (best-first, id ties, 5 − (5·(rank−1)) div n), quintiles
  * must be equal-population by construction, and the segment CASE must
  * fire in its declared order. */
class RfmSpec extends SparkSuite {
  import spark.implicits._

  private def scoreOf(ranked: Seq[Long]): Map[Long, Long] = {
    // ranked = cust ids best-first; score by the shared formula
    val n = ranked.size.toLong
    ranked.zipWithIndex.map { case (c, i) => c -> (5L - (5L * i) / n) }.toMap
  }

  test("B50: scores equal the rank replay; quintiles are equal-population") {
    val rnd = new scala.util.Random(29)
    val orders = (1L to 50L).flatMap { c =>
      val k = 1 + rnd.nextInt(6)
      (0 until k).map { _ =>
        (c, Date.valueOf(s"2024-0${1 + rnd.nextInt(9)}-${10 + rnd.nextInt(18)}"),
          (1000 + rnd.nextInt(900000)).toLong)
      }
    }
    val got = Rfm.rfmScores(orders.toDF("ck", "d", "cents"), "ck", col("d"),
        col("cents"))
      .select("cust", "rec_days", "freq", "mon_cents", "r_score", "f_score", "m_score")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    val per = orders.groupBy(_._1).map { case (c, os) =>
      (c, os.map(_._2.toLocalDate).max, os.size.toLong, os.map(_._3).sum)
    }.toSeq
    val refD = per.map(_._2).max
    val rec = per.map(p => (p._1, java.time.temporal.ChronoUnit.DAYS.between(p._2, refD)))
    val rs = scoreOf(rec.sortBy(p => (p._2, p._1)).map(_._1))
    val fs = scoreOf(per.sortBy(p => (-p._3, p._1)).map(_._1))
    val ms = scoreOf(per.sortBy(p => (-p._4, p._1)).map(_._1))
    for ((c, _, f, m) <- per) {
      val g = got(c)
      assert((g._5, g._6, g._7) == ((rs(c), fs(c), ms(c))), s"cust $c")
      assert(g._3 == f && g._4 == m)
    }
    // equal population: 50 customers → exactly 10 per score per dimension
    for (dim <- Seq(got.values.map(_._5), got.values.map(_._6), got.values.map(_._7)))
      assert(dim.groupBy(identity).view.mapValues(_.size).toMap ==
        (1L to 5L).map(_ -> 10).toMap)
  }

  test("B50: segment CASE fires in declared order") {
    // three synthetic customers per extreme: many recent big orders
    // (champion), one old small order (hibernating), one recent small
    // order (new). Filler customers spread the quintiles.
    val d = (s: String) => Date.valueOf(s)
    val champ = (1 to 8).map(i => (1L, d(s"2024-09-2$i"), 900000L))
    val hiber = Seq((2L, d("2024-01-05"), 100L))
    val fresh = Seq((3L, d("2024-09-27"), 120L))
    val fill = (10L until 40L).flatMap { c =>
      (0 until (c % 5).toInt + 1).map(i =>
        (c, d(s"2024-0${1 + (c % 8)}-1${i % 9}"), 1000L * (c % 17 + 1)))
    }
    val res = Rfm.rfmScores((champ ++ hiber ++ fresh ++ fill).toDF("ck", "d", "cents"),
        "ck", col("d"), col("cents"))
      .select("cust", "segment").as[(Long, String)].collect().toMap
    assert(res(1L) == "champion")
    assert(res(2L) == "hibernating")
    assert(res(3L) == "new")
  }
}
