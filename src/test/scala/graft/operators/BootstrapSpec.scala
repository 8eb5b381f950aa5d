package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C150: the hash-drawn weights must follow the Poisson(1) pmf, the
  * bootstrap SE must sit in the classical σ/√n band, replicate means
  * must be exact integer quotients of their own sums, and the whole
  * draw must be deterministic. */
class BootstrapSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(53)
  private val corpus = Seq.tabulate(6000)(i => (i.toLong, (200 + rnd.nextGaussian() * 40).toLong))

  test("C150: weights follow Poisson(1); replicate means are exact quotients") {
    val reps = Bootstrap.bootstrapReplicates(corpus.toDF("id", "x"),
        col("id"), col("x"), replicates = 24)
      .select("r", "n_eff", "wsum", "wxsum", "mean_ppm")
      .as[(Int, Long, Long, java.math.BigDecimal, Long)].collect()
    assert(reps.length == 24)
    for (r <- reps) {
      // mean weight per row ≈ 1 (Poisson(1)): wsum within 5% of n
      assert(math.abs(r._3 - 6000L) < 300, s"replicate ${r._1}: wsum ${r._3}")
      // n_eff ≈ (1 − e^−1)·n ≈ 63.2%
      assert(math.abs(r._2 - 3793L) < 300, s"replicate ${r._1}: n_eff ${r._2}")
      // the exported mean_ppm IS the integer quotient of the sums
      assert(r._5 == (BigInt(1000000) * BigInt(r._4.toBigInteger) / r._3).toLong)
    }
    // replicates genuinely differ
    assert(reps.map(_._5).distinct.length > 20)
  }

  test("C150: SE sits in the classical band; CI brackets the mean; deterministic") {
    val df = corpus.toDF("id", "x")
    val got = Bootstrap.bootstrapCi(df, col("id"), col("x"), replicates = 48)
      .as[(Long, Double, Long, Double, Double, Double)].head()
    val (n, meanFull, nr, se, lo, hi) = got
    assert(n == 6000L && nr == 48L)
    val xs = corpus.map(_._2.toDouble)
    val trueMean = xs.sum / xs.size
    assert(math.abs(meanFull - trueMean) < 1e-9)
    val sd = math.sqrt(xs.map(v => (v - trueMean) * (v - trueMean)).sum / (xs.size - 1))
    val classical = sd / math.sqrt(xs.size.toDouble)
    assert(se > classical * 0.6 && se < classical * 1.6,
      s"bootstrap se $se vs classical $classical")
    assert(lo < trueMean && trueMean < hi)
    val again = Bootstrap.bootstrapCi(df, col("id"), col("x"), replicates = 48)
      .as[(Long, Double, Long, Double, Double, Double)].head()
    assert(got == again, "hash-drawn bootstrap is deterministic")
  }
}
