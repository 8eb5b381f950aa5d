package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C141/C142/C143: the categorical-dependence audits must equal
  * driver-side BigInt replays of the quantized contracts, hit the
  * analytic extremes (independence → ~0, determinism → V²/NMI at full
  * scale), account for ABSENT contingency cells (χ² only), and the
  * Pareto front must equal the brute-force domination test with
  * front-ties surviving together. */
class DependenceSpec extends SparkSuite {
  import spark.implicits._

  // driver-side q10 binary log, mirroring Search.log2q10Sql
  private def l2q10(x: Long): Long = {
    require(x > 0)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e >= 20) x / (1L << (e - 20)) else x * (1L << (20 - e))
    var acc = e.toLong * 1024
    var w = 512L
    for (_ <- 1 to 10) {
      val sq = m * m / 1048576L
      if (sq >= 2097152L) { m = sq / 2; acc += w } else m = sq
      w /= 2
    }
    acc
  }

  private def bruteChi2(rows: Seq[(String, String)]): (BigInt, BigInt, (String, String)) = {
    val n = BigInt(rows.size)
    val o = rows.groupBy(identity).view.mapValues(v => BigInt(v.size)).toMap
    val rm = rows.groupBy(_._1).view.mapValues(v => BigInt(v.size)).toMap
    val cm = rows.groupBy(_._2).view.mapValues(v => BigInt(v.size)).toMap
    val terms = for (x <- rm.keys.toSeq; y <- cm.keys.toSeq) yield {
      val oc = o.getOrElse((x, y), BigInt(0))
      val d = oc * n - rm(x) * cm(y)
      ((x, y), d * d * 1000000 / (n * rm(x) * cm(y)))
    }
    val chi2 = terms.map(_._2).sum
    val mins = rm.size.min(cm.size) - 1
    val v2 = if (mins >= 1) chi2 / (n * mins) else BigInt(-1)
    val worst = terms.minBy { case ((x, y), t) => (-t, x, y) }._1
    (chi2, v2, worst)
  }

  test("C141: chi-square equals the BigInt brute force, incl. the worst cell") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(3000)((s"x${rnd.nextInt(5)}", s"y${rnd.nextInt(4) * rnd.nextInt(2)}"))
    val (chi2, v2, worst) = bruteChi2(rows)
    val got = Dependence.chiSquare(rows.toDF("a", "b"), col("a"), col("b"))
      .select("n_rows", "chi2_ppm", "v2_ppm", "worst_x", "worst_y")
      .as[(Long, Long, Long, String, String)].head()
    assert(got == ((3000L, chi2.toLong, v2.toLong, worst._1, worst._2)))
  }

  test("C141: exact product structure scores 0; x == y scores V² = 10⁶") {
    // perfectly independent: every (x, y) cell count = r·c/N exactly
    val indep = for (x <- 0 until 3; y <- 0 until 4; _ <- 0 until (x + 1) * (y + 1))
      yield (s"x$x", s"y$y")
    val gi = Dependence.chiSquare(indep.toDF("a", "b"), col("a"), col("b"))
      .select("chi2_ppm", "v2_ppm", "dof").as[(Long, Long, Long)].head()
    assert(gi == ((0L, 0L, 6L)))
    // perfectly dependent: y determined by x (square table) → V² = 1
    val dep = Seq.tabulate(300)(i => (s"v${i % 4}", s"v${i % 4}"))
    val gd = Dependence.chiSquare(dep.toDF("a", "b"), col("a"), col("b"))
      .select("v2_ppm").as[Long].head()
    assert(gd == 1000000L)
  }

  test("C141: an absent cell still carries its expected mass (dense grid)") {
    // (x1,y1) never occurs: its term = (0·N − r·c)²·10⁶/(N·r·c) = r·c·10⁶/N
    val rows = Seq(("x0", "y0"), ("x0", "y1"), ("x1", "y0"))
    val (chi2, _, worst) = bruteChi2(rows)
    val got = Dependence.chiSquare(rows.toDF("a", "b"), col("a"), col("b"))
      .select("chi2_ppm", "worst_x", "worst_y").as[(Long, String, String)].head()
    assert(got._1 == chi2.toLong && chi2 > 0)
    assert((got._2, got._3) == worst)
  }

  private def bruteMi(rows: Seq[(String, String)]): (BigInt, BigInt, BigInt) = {
    val n = rows.size.toLong
    val o = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rm = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cm = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val smi = o.map { case ((x, y), c) =>
      BigInt(c) * ((l2q10(c) + l2q10(n)) - (l2q10(rm(x)) + l2q10(cm(y)))) }.sum
    val shx = rm.values.map(r => BigInt(r) * (l2q10(n) - l2q10(r))).sum
    val shy = cm.values.map(c => BigInt(c) * (l2q10(n) - l2q10(c))).sum
    (smi, shx, shy)
  }

  test("C142: mutual information equals the BigInt q10 replay per feature") {
    val rnd = new scala.util.Random(11)
    val f1 = Seq.fill(2000)((s"a${rnd.nextInt(3)}", s"b${rnd.nextInt(3)}"))
    val f2 = Seq.fill(2000) { val v = rnd.nextInt(4); (s"a$v", s"b${v / 2}") }
    val df = (f1.map(r => (1L, r._1, r._2)) ++ f2.map(r => (2L, r._1, r._2)))
      .toDF("f", "a", "b")
    val got = Dependence.mutualInfo(df, col("f"), col("a"), col("b"))
      .select("feature", "mi_q10", "hx_q10", "hy_q10", "nmi_pm")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for ((f, rows) <- Seq(1L -> f1, 2L -> f2)) {
      val (smi, shx, shy) = bruteMi(rows)
      val n = BigInt(rows.size)
      val nmi = (BigInt(1000) * smi / shx.min(shy)).toLong
      assert(got(f) == ((
        (smi / n).toLong, (shx / n).toLong, (shy / n).toLong, nmi)), s"feature $f")
    }
    // the half-determined feature must carry far more signal
    assert(got(2L)._4 > 400 && got(1L)._4 < 50)
  }

  test("C142: x == y gives NMI exactly 1000; a constant side gives NULL") {
    val dep = Seq.tabulate(200)(i => (1L, s"v${i % 5}", s"v${i % 5}"))
    val g1 = Dependence.mutualInfo(dep.toDF("f", "a", "b"), col("f"), col("a"), col("b"))
      .select("nmi_pm").as[Long].head()
    assert(g1 == 1000L)
    val const = Seq.tabulate(100)(i => (1L, s"v${i % 5}", "k"))
    val g2 = Dependence.mutualInfo(const.toDF("f", "a", "b"), col("f"), col("a"), col("b"))
      .select("mi_q10", "nmi_pm").as[(Long, Option[Long])].head()
    assert(g2 == ((0L, None)))
  }

  private def bruteFront(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { p => !pts.exists(q =>
      q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3)) }
      .map(_._1).toSet

  test("C143: Pareto front equals brute-force domination on random points") {
    val rnd = new scala.util.Random(13)
    val pts = Seq.tabulate(500)(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val got = Sampling.paretoFront(pts.toDF("id", "px", "py"), col("px"), col("py"))
      .select("id").as[Long].collect().toSet
    assert(got == bruteFront(pts))
  }

  test("C143: equal points on the front survive together; chains collapse to the maximum") {
    val pts = Seq((1L, 10L, 10L), (2L, 10L, 10L), (3L, 5L, 5L), (4L, 10L, 9L))
    val got = Sampling.paretoFront(pts.toDF("id", "px", "py"), col("px"), col("py"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
    val single = Sampling.paretoFront(Seq((9L, 1L, 1L)).toDF("id", "px", "py"),
      col("px"), col("py")).select("id").as[Long].collect().toSet
    assert(single == Set(9L))
  }

  // ----------------------------------------------------------- C154 WOE/IV

  /** Brute replay of woeIv's smoothed integer construction. */
  private def refWoe(rows: Seq[(String, Boolean)]): Map[String, (Long, Long, Long, Long, Long, Long)] = {
    val cats = rows.map(_._1).distinct
    val k = cats.size.toLong
    val tg = rows.count(_._2).toLong
    val tb = rows.size - tg
    cats.map { c =>
      val g = rows.count(r => r._1 == c && r._2).toLong
      val b = rows.count(r => r._1 == c && !r._2).toLong
      val (gp, bp, tgp, tbp) = (g + 1, b + 1, tg + k, tb + k)
      val posPpm = 1000000L * gp / tgp
      val negPpm = 1000000L * bp / tbp
      val woe = l2q10(gp * tbp) - l2q10(bp * tgp)
      c -> ((g, b, posPpm, negPpm, woe, (posPpm - negPpm) * woe))
    }.toMap
  }

  test("C154: WOE/IV matches the brute replay; a separating feature scores high, noise ~0") {
    val rnd = new scala.util.Random(31)
    // category 'hi' is 90% positive, 'lo' 10%, 'mid' 50% — separating;
    // plus 'noise' at the base rate
    val rows = Seq.tabulate(1200) { i =>
      val c = Seq("hi", "lo", "mid", "noise")(i % 4)
      val p = c match {
        case "hi" => 0.9; case "lo" => 0.1; case _ => 0.5
      }
      (c, rnd.nextDouble() < p)
    }
    val got = Dependence.woeIv(rows.toDF("cat", "y"), col("cat"), col("y"))
      .select("category", "n_pos", "n_neg", "pos_ppm", "neg_ppm", "woe_q10",
        "iv_term_q10ppm", "iv_q10ppm")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
    val want = refWoe(rows)
    assert(got.length == 4)
    for (g <- got)
      assert(want(g._1) == ((g._2, g._3, g._4, g._5, g._6, g._7)), s"cat ${g._1}: $g")
    val ivTotal = want.values.map(_._6).sum
    assert(got.forall(_._8 == ivTotal), "total repeated per row")
    // a separating feature: IV far above the 0.02-nats "useless" line
    assert(ivTotal > 30L * 1000000, s"separating IV: $ivTotal")
    assert(want("hi")._5 > 0 && want("lo")._5 < 0, "WOE signs follow the rates")
    // an uninformative feature: IV near zero
    val flat = rows.map { case (_, y) => (if (y) "a" else "a", y) } ++
      Seq(("b", true), ("b", false))
    val gotFlat = Dependence.woeIv(flat.toDF("cat", "y"), col("cat"), col("y"))
      .select("iv_q10ppm").distinct().as[Long].head()
    assert(math.abs(gotFlat) < ivTotal / 20, s"uninformative IV must be small: $gotFlat")
  }
}
