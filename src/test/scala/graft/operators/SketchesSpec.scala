package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** HLL sketch laws: rolled-up (merged) estimates must equal one-shot
  * estimates over the same data, and both must sit within HLL's error
  * envelope of the exact distinct count. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
      (col("o_orderkey") % 4).as("g"))

  test("sketch rollup (union of partials) equals the one-shot sketch estimate") {
    val perYear = Sketches.distinctSketches(orders, Seq("g", "yr"), "o_custkey")
    val rolled = Sketches.rollupEstimate(perYear, Seq("g"))
      .as[(Long, Long)].collect().toMap
    val oneShot = orders.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))).as("e"))
      .as[(Long, Long)].collect().toMap
    assert(rolled == oneShot, "merge-then-estimate must equal estimate-over-all")
  }

  test("estimates are within 5% of exact distinct counts") {
    val exact = orders.groupBy("g").agg(countDistinct(col("o_custkey")).as("n"))
      .as[(Long, Long)].collect().toMap
    val est = Sketches.rollupEstimate(
      Sketches.distinctSketches(orders, Seq("g", "yr"), "o_custkey"), Seq("g"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.05, s"g=$g exact=$n est=${est(g)}")
    }
  }
}
