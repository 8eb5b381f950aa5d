package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C117: the ×period-scaled decomposition must equal a brute-force
  * driver reference, remove a planted weekly pattern completely (zero
  * residuals), and surface a planted spike as the top anomaly. */
class SeasonalSpec extends SparkSuite {
  import spark.implicits._

  /** Brute force: centered MA, truncating per-phase means, centering. */
  private def ref(xs: Seq[Long], period: Int): Seq[(Int, Long)] = {
    val h = period / 2
    val interior = (h until xs.size - h).map { t =>
      val trend = (t - h to t + h).map(xs).sum
      (t, period.toLong * xs(t) - trend)
    }
    val byPhase = interior.groupBy(_._1 % period)
    val sRaw = byPhase.view.mapValues { rows =>
      val s = rows.map(_._2).sum; s / rows.size // JVM / truncates toward 0
    }.toMap
    val mean = sRaw.values.sum / period
    interior.map { case (t, dd) => (t, dd - (sRaw(t % period) - mean)) }
  }

  test("C117: matches the brute-force reference on a noisy weekly series") {
    val rnd = new scala.util.Random(13)
    val pattern = Seq(40L, 10L, 55L, 30L, 25L, 70L, 15L)
    val xs = Seq.tabulate(120)(t => pattern(t % 7) + 100L + rnd.nextInt(9) - 4)
    val df = xs.zipWithIndex.map { case (x, t) => (t, x) }.toDF("d", "x")
    val got = Seasonal.decompose(df, col("d"), col("x"),
        (col("d") % 7).cast("long"), period = 7)
      .select("t", "resid").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(got == ref(xs, 7).sortBy(_._1))
  }

  test("C117: a pure weekly pattern over a linear trend decomposes to (near-)zero residuals") {
    // linear trend: the centered MA recovers it exactly; the pattern is
    // exactly periodic — residuals reduce to the truncation dust of the
    // integer means (bounded by the period)
    val pattern = Seq(700L, 70L, 350L, 210L, 140L, 560L, 0L)
    val xs = Seq.tabulate(140)(t => 1000L + 3L * t + pattern(t % 7))
    val df = xs.zipWithIndex.map { case (x, t) => (t, x) }.toDF("d", "x")
    val got = Seasonal.decompose(df, col("d"), col("x"),
        (col("d") % 7).cast("long"), period = 7)
      .select("resid").as[Long].collect()
    assert(got.forall(r => math.abs(r) <= 7L), s"max |resid| = ${got.map(math.abs).max}")
  }

  test("C117: a planted spike is the top anomaly, not the weekly low") {
    val pattern = Seq(40L, 10L, 55L, 30L, 25L, 70L, 15L)
    val xs0 = Seq.tabulate(100)(t => 100L + pattern(t % 7))
    val spikeAt = 53
    val xs = xs0.updated(spikeAt, xs0(spikeAt) + 300L)
    val df = xs.zipWithIndex.map { case (x, t) => (t, x) }.toDF("d", "x")
    val top = Seasonal.decompose(df, col("d"), col("x"),
        (col("d") % 7).cast("long"), period = 7)
      .orderBy(abs(col("resid")).desc, col("t").asc)
      .select("t").as[Int].head()
    assert(top == spikeAt, s"top anomaly at $top, planted at $spikeAt")
  }

  test("C117: interior-only — edge rows without a full centered frame are dropped") {
    val df = (0 until 20).map(t => (t, 10L)).toDF("d", "x")
    val ts = Seasonal.decompose(df, col("d"), col("x"),
        (col("d") % 7).cast("long"), period = 7)
      .select("t").as[Int].collect().sorted
    assert(ts.toSeq == (3 until 17).toSeq)
  }
}
