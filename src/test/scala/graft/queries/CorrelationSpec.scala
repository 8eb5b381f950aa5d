package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** A33: the exact-power-sum Pearson r must agree with Spark's built-in
  * corr()/covar_samp() to float tolerance — the exact sums exist for
  * cross-engine determinism, not to change the statistic. */
class CorrelationSpec extends SparkSuite {
  import spark.implicits._

  test("q112 equals built-in corr and covar_samp within 1e-9") {
    val t = Tables(spark, sfDir)
    val got = Relational.q112Correlation(t)
      .select("l_returnflag", "corr_price_qty", "cov_samp")
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val ref = t.lineitem.groupBy("l_returnflag")
      .agg(corr(col("l_extendedprice"), col("l_quantity")).as("c"),
           covar_samp(col("l_extendedprice"), col("l_quantity")).as("cv"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (flag, (c, cv)) =>
      assert(math.abs(c - ref(flag)._1) < 1e-9, s"corr for $flag: $c vs ${ref(flag)._1}")
      // cents quantization perturbs covariance only at the rounding scale
      assert(math.abs(cv - ref(flag)._2) / math.abs(ref(flag)._2) < 1e-6,
        s"cov for $flag: $cv vs ${ref(flag)._2}")
    }
  }
}
