package graft.queries

import graft.SparkSuite

/** A41: the OLS fit must reproduce a driver-side least-squares replay and
  * satisfy the regression identities (R² ∈ [0,1], forecast = fit at d1+1). */
class TrendRegressionSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  test("q168: matches driver-side OLS on the daily frame, identities hold") {
    val daily = t.events
      .selectExpr("event_type", "ts div 86400000000000 as day",
        "cast(value as decimal(18,2)) as v")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.expr("cast(sum(v) * 100 as long)").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).sortBy(_._1)).toMap

    val got = Relational.q168TrendRegression(t)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq == daily.keys.toSeq.sorted)

    got.foreach { case (et, n, slope, intercept, r2, forecast) =>
      val pts = daily(et)
      assert(n == pts.length)
      val xs = pts.map(_._1.toDouble)
      val ys = pts.map(_._2.toDouble / 100)
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxy = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      val sxx = xs.map(x => (x - mx) * (x - mx)).sum
      val expSlope = sxy / sxx
      assert(math.abs(slope - expSlope) <= 1e-9 * math.max(1.0, math.abs(expSlope)),
        s"$et slope $slope vs $expSlope")
      assert(math.abs(intercept - (my - expSlope * mx)) <=
        1e-9 * math.max(1.0, math.abs(intercept)))
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"$et r2 $r2")
      // forecast is the fitted line evaluated one day past the last observation
      val d1 = pts.last._1
      assert(math.abs(forecast - (intercept + slope * (d1 + 1))) <=
        1e-6 * math.max(1.0, math.abs(forecast)))
    }
  }
}
