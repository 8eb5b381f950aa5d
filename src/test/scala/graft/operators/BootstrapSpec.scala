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

  test("C150: constant value column yields se = 0, never NaN (variance clamp)") {
    // all replicate means are identical → sm2 - sm²/n can round an ulp
    // below zero in doubles; the clamp must return exactly 0, and the CI
    // must collapse onto the mean
    val const = Seq.tabulate(500)(i => (i.toLong, 123L)).toDF("id", "x")
    val got = Bootstrap.bootstrapCi(const, col("id"), col("x"), replicates = 48)
      .as[(Long, Double, Long, Double, Double, Double)].head()
    assert(!got._4.isNaN && got._4 == 0.0, s"se must be exactly 0: ${got._4}")
    assert(got._5 == 123.0 && got._6 == 123.0)
  }

  test("C150: all-zero-weight replicates are dropped, not emitted as NULL rows") {
    // a 1-row input draws W = 0 in ~e^-1 of replicates; those replicates
    // must vanish from the frame (so n_replicates reports replicates
    // actually used) rather than surface NULL means
    val tiny = Seq((7L, 42L)).toDF("id", "x")
    val reps = Bootstrap.bootstrapReplicates(tiny, col("id"), col("x"), replicates = 200)
      .select("r", "wsum", "mean_ppm").as[(Int, Long, Long)].collect()
    assert(reps.forall(_._2 > 0L), "no zero-weight replicate may survive")
    assert(reps.length < 200, "some replicates must have drawn W=0 and been dropped")
    assert(reps.length > 80, "most replicates survive (P(W>0) = 1 - e^-1)")
    assert(reps.forall(_._3 == 42000000L))
    val ci = Bootstrap.bootstrapCi(tiny, col("id"), col("x"), replicates = 200)
      .as[(Long, Double, Long, Double, Double, Double)].head()
    assert(ci._3 == reps.length.toLong, "n_replicates reports the replicates actually used")
    assert(!ci._4.isNaN && ci._4 == 0.0)
  }
}
