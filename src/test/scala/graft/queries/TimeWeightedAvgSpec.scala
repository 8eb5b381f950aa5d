package graft.queries

import graft.SparkSuite

/** A42: the step-function integral must match a driver-side replay and
  * diverge from the plain mean exactly when sampling is irregular. */
class TimeWeightedAvgSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  test("q173: matches a driver-side step integral on the daily frame") {
    val daily = t.events
      .selectExpr("event_type", "ts div 86400000000000 as day",
        "cast(value as decimal(18,2)) as v")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("cast(sum(v) * 100 as long)").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1)).toMap

    val got = Relational.q173TimeWeightedAvg(t)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(got.map(_._1).toSeq == daily.keys.toSeq.sorted)
    got.foreach { case (et, nObs, span, twa, plain) =>
      val pts = daily(et)
      assert(nObs == pts.length)
      assert(span == pts.last._1 - pts.head._1 + 1)
      val integral = pts.zip(pts.drop(1)).map {
        case ((d0, c0), (d1, _)) => c0 * (d1 - d0)
      }.sum + pts.last._2 // last observation holds one day
      assert(twa == integral.toDouble / (span * 100).toDouble, s"$et twa")
      assert(plain == pts.map(_._2).sum.toDouble / (nObs * 100).toDouble, s"$et plain")
    }
  }

  test("q173: irregular sampling separates the two means predictably") {
    // value 100 held for 9 days, then value 0 sampled densely for 1 day:
    // plain mean = 50, time-weighted = 90 — the step integral must win
    val pts = Seq((0L, 10000L, 9L), (9L, 0L, 1L))
    val integral = pts.map { case (_, c, w) => c * w }.sum
    assert(integral / 10.0 / 100.0 == 90.0)
    assert(pts.map(_._2).sum / 2.0 / 100.0 == 50.0)
  }
}
