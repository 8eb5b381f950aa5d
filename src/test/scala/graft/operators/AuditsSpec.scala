package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C120/C121: both shape audits must equal brute-force references,
  * hit their analytic extremes (Benford-conforming data scores near 0,
  * uniform first digits score the known TVD; equal masses → Gini 0,
  * one-holds-all → near 1000), and define degenerate inputs as 0. */
class AuditsSpec extends SparkSuite {
  import spark.implicits._

  private def bruteBenford(vals: Seq[Long]): (Long, Long, Long) = {
    val ds = vals.filter(_ > 0).map(_.toString.head.asDigit.toLong)
      .filter(d => d >= 1 && d <= 9)
    val n = ds.size.toLong
    val gaps = (1 to 9).map { d =>
      val obs = ds.count(_ == d).toLong * 1000 / n
      (d.toLong, obs - Audits.benfordPm(d - 1))
    }
    val tvd = gaps.map(g => math.abs(g._2)).sum / 2
    val worst = gaps.maxBy(g => (math.abs(g._2), -g._1))
    (tvd, worst._1, worst._2)
  }

  test("C120: matches brute force; Benford-ish data scores low, uniform digits score high") {
    // Benford-conforming: v = floor(10^u) for u uniform — first digits
    // follow log10(1+1/d) by construction
    val rnd = new scala.util.Random(41)
    val benfordish = Seq.fill(4000)(math.pow(10.0, 2 + 4 * rnd.nextDouble()).toLong)
    val uniform = Seq.fill(4000)(100L + rnd.nextInt(900)) // digits ~uniform
    val df = (benfordish.map(("b", _)) ++ uniform.map(("u", _))).toDF("s", "v")
    val got = Audits.benford(df, col("s"), col("v"))
      .select("slice", "tvd_pm", "worst_digit", "worst_gap_pm")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("b") == bruteBenford(benfordish))
    assert(got("u") == bruteBenford(uniform))
    assert(got("b")._1 < 60, s"Benford-conforming TVD should be small: ${got("b")}")
    // uniform digits: TVD = sum |111−exp| / 2 ≈ 190+
    assert(got("u")._1 > 150, s"uniform-digit TVD should be large: ${got("u")}")
    assert(got("u")._2 == 1L, "digit 1 is the most under-represented under uniform")
  }

  test("C120: non-positive rows are ignored; a missing digit gaps the full expectation") {
    val vals = Seq(-5L, 0L) ++ Seq.fill(100)(200L) // all mass on digit 2
    val got = Audits.benford(vals.map(("s", _)).toDF("s", "v"), col("s"), col("v"))
      .select("n_rows", "tvd_pm", "worst_digit", "worst_gap_pm")
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 == 100L)
    // obs = (0,1000,0,...) vs expectation — TVD = (|0−301| + |1000−176| + 124+96+79+66+57+51+45)/2
    assert(got == ((100L, bruteBenford(vals)._1, 2L, 1000L - 176L)))
  }

  private def bruteGini(xs: Seq[Long]): Long = {
    if (xs.size <= 1 || xs.sum <= 0) return 0L
    val sorted = xs.sorted
    val n = xs.size.toLong
    val six = sorted.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
    ((BigInt(2000) * six - BigInt(1000) * (n + 1) * xs.sum) /
      (BigInt(n) * xs.sum)).toLong
  }

  test("C121: matches brute force; equal masses → 0, one-holds-all → near 1000") {
    val rnd = new scala.util.Random(43)
    val mixed = Seq.fill(80)(rnd.nextInt(5000).toLong + 1)
    val equal = Seq.fill(40)(250L)
    val oneAll = 999000L +: Seq.fill(99)(1L)
    val df = (mixed.map(("m", _)) ++ equal.map(("e", _)) ++ oneAll.map(("o", _)))
      .toDF("s", "x")
    val got = Audits.gini(df, col("s"), col("x"))
      .select("slice", "gini_pm").as[(String, Long)].collect().toMap
    assert(got("m") == bruteGini(mixed))
    assert(got("e") == 0L)
    assert(got("o") == bruteGini(oneAll) && got("o") > 950, s"one-holds-all: ${got("o")}")
  }

  test("C121: degenerate slices — single unit and zero total are 0, not errors") {
    val df = Seq(("one", 42L), ("zero", 0L), ("zero", 0L)).toDF("s", "x")
    val got = Audits.gini(df, col("s"), col("x"))
      .select("slice", "gini_pm").as[(String, Long)].collect().toMap
    assert(got == Map("one" -> 0L, "zero" -> 0L))
  }
}
