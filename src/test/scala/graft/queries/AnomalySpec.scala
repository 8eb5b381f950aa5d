package graft.queries

import graft.SparkSuite
import java.nio.file.Files

/** D19: trailing-window anomaly flags on a planted series. */
class AnomalySpec extends SparkSuite {
  import spark.implicits._

  test("q120: a planted spike is flagged, steady oscillation is not") {
    val dayNs = 86400L * 1000L * 1000L * 1000L
    // days 0..9 oscillate 9/11 (mean 10, small std); day 10 spikes to 50
    val rows = (0 to 9).map { d =>
      (d.toLong, d * dayNs, 1L, "view", if (d % 2 == 0) 9.0 else 11.0)
    } :+ ((10L, 10 * dayNs, 1L, "view", 50.0))
    val dir = Files.createTempDirectory("graft-anomaly").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Events.q120AnomalyFlags(Tables(spark, dir))
      .select("day", "anomaly", "trailing_mean")
      .as[(Long, Boolean, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    assert(!out.keySet.contains(0L) && !out.keySet.contains(2L),
      "days without >=3 trailing observations are not judged")
    (3L to 9L).foreach(d => assert(!out(d)._1, s"steady day $d must not flag"))
    assert(out(10L)._1, "the spike day must flag")
    // day 10's window = days 3..9: four 11s + three 9s -> 71/7
    assert(out(10L)._2 == 71.0 / 7)
  }
}
