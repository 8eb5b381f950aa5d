package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** A20's scale path: approx_percentile (t-digest-style bounded-memory
  * aggregate) must stay within its accuracy envelope of the exact
  * sort-based percentile, per group, at the query's exact shape. */
class ApproxPercentileSpec extends SparkSuite {
  import spark.implicits._

  test("approx_percentile tracks exact percentile within 1% of the value") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val both = orders.groupBy("o_orderstatus").agg(
      expr("percentile(o_totalprice, 0.5D)").as("exact_p50"),
      expr("approx_percentile(o_totalprice, 0.5D, 10000)").as("approx_p50"),
      expr("percentile(o_totalprice, 0.99D)").as("exact_p99"),
      expr("approx_percentile(o_totalprice, 0.99D, 10000)").as("approx_p99"))
      .as[(String, Double, Double, Double, Double)].collect()
    assert(both.nonEmpty)
    both.foreach { case (s, e50, a50, e99, a99) =>
      assert(math.abs(a50 - e50) / e50 < 0.01, s"$s p50: exact=$e50 approx=$a50")
      assert(math.abs(a99 - e99) / e99 < 0.01, s"$s p99: exact=$e99 approx=$a99")
    }
  }
}
