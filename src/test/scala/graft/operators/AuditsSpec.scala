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

  // ---------------------------------------- C131: entropy + KL

  private def l2q10Ref(x: Long): Long = {
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e >= 20) x >> (e - 20) else x << (20 - e)
    var acc = e.toLong * 1024L; var w = 512L
    for (_ <- 1 to 10) {
      val sq = m * m / 1048576L
      if (sq >= 2097152L) { m = m * m / 2097152L; acc += w } else m = sq
      w /= 2
    }
    acc
  }

  /** BigInt replay of the operator's exact contract. */
  private def bruteEntropyKl(rows: Seq[(String, String)]): Map[String, (Long, Long, Long, Option[Long], Long)] = {
    val g = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val m = rows.size.toLong
    rows.groupBy(_._1).map { case (s, rs) =>
      val c = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val ns = rs.size.toLong
      val sh = c.values.map(ci => BigInt(ci) * (l2q10Ref(ns) - l2q10Ref(ci))).sum
      val sk = c.map { case (t, ci) =>
        BigInt(ci) * ((l2q10Ref(ci) - l2q10Ref(ns)) - (l2q10Ref(g(t)) - l2q10Ref(m)))
      }.sum
      val h = (sh / ns).toLong
      val norm = if (c.size > 1) Some(1000L * h / l2q10Ref(c.size)) else None
      s -> ((ns, c.size.toLong, h, norm, (sk / ns).toLong))
    }
  }

  test("C131: entropy/KL match the BigInt replay; uniform slice hits exactly normalized 1000") {
    // u: 4 tokens × 4 each (uniform, H = 2 bits = 2048 q10, norm = 1000);
    // s: heavily skewed; o: single token (H = 0, norm NULL)
    val rows =
      (1 to 4).flatMap(i => Seq.fill(4)("u" -> s"t$i")) ++
      (Seq.fill(13)("s" -> "t1") ++ Seq("s" -> "t2", "s" -> "t3", "s" -> "t4")) ++
      Seq.fill(5)("o" -> "t9")
    val got = Audits.entropyKl(rows.toDF("s", "t"), col("s"), col("t"))
      .as[(String, Long, Long, Long, Option[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == bruteEntropyKl(rows), s"got $got")
    assert(got("u")._3 == 2048L && got("u")._4.contains(1000L), s"uniform: ${got("u")}")
    assert(got("o")._3 == 0L && got("o")._4.isEmpty)
    assert(got("s")._3 < got("u")._3, "skew lowers entropy")
    assert(got("s")._5 > got("u")._5, "the skewed slice sits farther from the mixture")
  }

  // ---------------------------------------- C160: Jensen–Shannon

  /** BigInt replay of jsDivergence's exact integer contract. */
  private def bruteJs(rows: Seq[(String, String)]): Map[String, Long] = {
    val slices = rows.map(_._1).distinct
    val gAll = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val mTot = rows.size.toLong
    slices.map { s =>
      val cs = rows.filter(_._1 == s).groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val n1 = cs.values.sum
      val n2 = mTot - n1
      var sp = BigInt(0); var sq = BigInt(0); var sd = 0L
      for ((t, c) <- cs) {
        val d = gAll(t) - c
        sd += d
        if (d > 0) {
          sp += BigInt(c) * (l2q10Ref(2 * c * n2) - l2q10Ref(c * n2 + d * n1))
          sq += BigInt(d) * (l2q10Ref(2 * d * n1) - l2q10Ref(c * n2 + d * n1))
        } else sp += BigInt(c) * 1024
      }
      val js =
        if (n2 > 0) (sp / (2 * n1) + (sq + BigInt(n2 - sd) * 1024) / (2 * n2)).toLong
        else Long.MinValue
      s -> js
    }.toMap
  }

  test("C160: JS matches the BigInt replay; bounded in [0, 1024]; disjoint maxes out") {
    val rnd = new scala.util.Random(71)
    val shared = Seq("a", "b", "c", "d", "e")
    val rows =
      // u: draws from the shared vocab uniformly; v: skewed to 'a' + own
      // token; w: completely disjoint vocabulary
      Seq.fill(400)(("u", shared(rnd.nextInt(5)))) ++
      Seq.fill(300)(("v", if (rnd.nextInt(4) == 0) "vown" else "a")) ++
      Seq.fill(200)(("w", Seq("x", "y", "z")(rnd.nextInt(3))))
    val got = Audits.jsDivergence(rows.toDF("s", "t"), col("s"), col("t"))
      .select("slice", "js_q10").as[(String, Long)].collect().toMap
    val want = bruteJs(rows)
    assert(got == want, s"$got vs $want")
    assert(got.values.forall(v => v >= 0 && v <= 1024), s"bounded: $got")
    // disjoint-vocabulary slice attains the maximum exactly
    assert(got("w") == 1024L, s"disjoint support must hit 1024: ${got("w")}")
    assert(got("u") < got("v"), "the skewed slice diverges more than the uniform one")
    // identical-to-rest degenerate: two slices with the same distribution
    val sym = Seq.fill(200)(("p", "t1")) ++ Seq.fill(200)(("q", "t1"))
    val gotSym = Audits.jsDivergence(sym.toDF("s", "t"), col("s"), col("t"))
      .select("slice", "js_q10").as[(String, Long)].collect().toMap
    assert(gotSym.values.forall(_ == 0L), s"identical distributions: $gotSym")
  }
}
