package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** B51: the KM table must equal a sequential driver-side fold
  * (at-risk accounting incl. censoring, per-step truncating ppm
  * product), and hit the analytic anchors: no censoring reduces to the
  * empirical survival; censored subjects hold risk without dropping
  * the curve; all-censored yields no rows. */
class SurvivalSpec extends SparkSuite {
  import spark.implicits._

  private def bruteKm(subjects: Seq[(Long, Boolean)]): Seq[(Long, Long, Long, Long, Long)] = {
    val byT = subjects.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, ss) =>
      (t, ss.count(_._2).toLong, ss.count(!_._2).toLong)
    }
    var atRisk = subjects.size.toLong
    var sp = 1000000L
    byT.flatMap { case (t, d, c) =>
      val row = if (d >= 1) {
        sp = sp * (atRisk - d) / atRisk
        Some((t, atRisk, d, c, sp))
      } else None
      atRisk -= d + c
      row
    }
  }

  test("B51: equals the sequential fold on mixed event/censor data") {
    val rnd = new scala.util.Random(43)
    val subjects = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(3) > 0))
    val got = Survival.kaplanMeier(subjects.toDF("dur", "ev"), col("dur"), col("ev"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == bruteKm(subjects))
  }

  test("B51: censoring holds risk without dropping the curve; anchors") {
    // no censoring: S(t) = fraction surviving past t (empirical)
    val plain = Seq(1L, 2L, 2L, 3L, 5L).map((_, true))
    val got = Survival.kaplanMeier(plain.toDF("dur", "ev"), col("dur"), col("ev"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._5)).toSeq ==
      Seq((1L, 800000L), (2L, 400000L), (3L, 200000L), (5L, 0L)),
      "empirical fractions 4/5, 2/5, 1/5, 0")
    // a censored subject between events keeps n_risk up at the earlier
    // event and is gone by the later one
    val cens = Seq((1L, true), (2L, false), (3L, true))
    val gc = Survival.kaplanMeier(cens.toDF("dur", "ev"), col("dur"), col("ev"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // t=1: risk 3, S = 666666 ppm; t=3: risk 1 (the censor left), S -> 0
    assert(gc.toSeq == Seq((1L, 3L, 1L, 0L, 666666L), (3L, 1L, 1L, 0L, 0L)))
    // all censored: no event times, empty curve
    assert(Survival.kaplanMeier(Seq((4L, false), (9L, false)).toDF("dur", "ev"),
      col("dur"), col("ev")).count() == 0)
  }
}
