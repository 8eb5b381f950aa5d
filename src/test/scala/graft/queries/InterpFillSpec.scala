package graft.queries

import graft.SparkSuite

/** A40: linear interpolation must reproduce a per-type brute-force replay
  * and keep every interpolated value inside its bracketing pair. */
class InterpFillSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  test("q167: matches a driver-side replay of the blend, edges null") {
    // observed daily cents per type from the raw events
    val obs = t.events
      .selectExpr("event_type", "ts div 86400000000000 as day",
        "cast(value as decimal(18,2)) as v")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("cast(sum(v) * 100 as long)").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val allDays = t.events.selectExpr("ts div 86400000000000 as day")
      .as[Long].collect()
    val (d0, d1) = (allDays.min, allDays.max)

    val expected = obs.keys.toSeq.sorted.flatMap { et =>
      val m = obs(et)
      val days = m.keys.toVector.sorted
      (d0 to d1).map { day =>
        m.get(day) match {
          case Some(c) => (et, day, Some(c.toDouble / 100), "observed")
          case None =>
            val prev = days.filter(_ < day).lastOption
            val next = days.find(_ > day)
            (prev, next) match {
              case (Some(pd), Some(nd)) =>
                val v = (m(pd) * (nd - day) + m(nd) * (day - pd)).toDouble / ((nd - pd) * 100)
                (et, day, Some(v), "interpolated")
              case _ => (et, day, None: Option[Double], "edge")
            }
        }
      }
    }
    val got = Relational.q167InterpFill(t)
      .as[(String, Long, Option[Double], String)].collect().toSeq
    assert(got == expected)
    // interpolated values sit inside their bracketing pair
    got.filter(_._4 == "interpolated").foreach { case (et, day, Some(v), _) =>
      val m = obs(et); val days = m.keys.toVector.sorted
      val lo = m(days.filter(_ < day).last).toDouble / 100
      val hi = m(days.find(_ > day).get).toDouble / 100
      assert(v >= math.min(lo, hi) - 1e-9 && v <= math.max(lo, hi) + 1e-9)
    case _ => ()
    }
  }
}
