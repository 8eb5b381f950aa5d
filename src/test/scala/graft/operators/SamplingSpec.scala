package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C21/C22 — deterministic sampling: stratified Bernoulli fractions and
  * the two-phase fixed-size per-stratum selection. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("stratifiedSample: deterministic, per-stratum fractions within tolerance") {
    val fr = Map("F" -> 0.10, "O" -> 0.05, "P" -> 0.50)
    val s1 = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", fr)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val s2 = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", fr)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(s1 == s2, "same input, same sample — no RNG state")

    val totals = orders.groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", fr)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    fr.foreach { case (st, f) =>
      val n = totals(st); val k = sampled.getOrElse(st, 0L)
      // md5 buckets are uniform: expect f*n ± 5 sigma of Bernoulli noise
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(k - f * n) <= 5 * sigma + 1,
        s"$st: sampled $k of $n at fraction $f (expected ~${(f * n).round})")
    }
  }

  test("stratifiedSample: strata without a fraction are dropped") {
    val only = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey",
      Map("F" -> 1.0))
    assert(only.select("o_orderstatus").distinct().as[String].collect().toSeq == Seq("F"))
    assert(only.count() ==
      orders.filter(col("o_orderstatus") === "F").count(), "fraction 1.0 keeps every row")
  }

  test("reservoirPerStratum: two-phase selection equals the one-phase top-k") {
    val k = 37
    val got = Sampling.reservoirPerStratum(orders, "o_orderstatus", "o_orderkey", k)
      .select("o_orderstatus", "o_orderkey", "sample_rank")
      .as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(Sampling.rankHash(col("o_orderkey")).asc, col("o_orderkey").asc)
    val want = orders
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select("o_orderstatus", "o_orderkey", "sample_rank")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, "salted two-phase top-k must equal the global ranking")
  }

  test("reservoirPerStratum: exactly k rows per stratum (when the stratum has k)") {
    val k = 25
    val counts = Sampling.reservoirPerStratum(orders, "o_orderstatus", "o_orderkey", k)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    val totals = orders.groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    totals.foreach { case (st, n) =>
      assert(counts(st) == math.min(k.toLong, n), s"$st: ${counts(st)} of expected ${math.min(k.toLong, n)}")
    }
  }
  test("mixtureSample: hits target shares by downsampling only, deterministically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val weights = Map("src0" -> 4, "src1" -> 2)
    val out = Sampling.mixtureSample(docs, "source", "doc_id", weights)
    val got = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val before = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    // never upsamples
    got.foreach { case (src, n) => assert(n <= before(src), s"$src upsampled: $n > ${before(src)}") }
    // the max-weight source keeps ~everything (it binds the cap), and the
    // realized shares order like the weights: src0 > src1 > default
    assert(got("src0") == before("src0"), "the binding source keeps all rows")
    assert(got("src0") > got("src1") && got("src1") > got.getOrElse("src2", 0L),
      s"shares must order like weights, got $got")
    // determinism
    val again = Sampling.mixtureSample(docs, "source", "doc_id", weights)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == got)
  }

}
