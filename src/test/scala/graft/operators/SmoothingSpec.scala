package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C144/C145: the EWMA walk must equal a sequential driver-side fold
  * (incl. the truncating fixed-point arithmetic), the carry law must
  * make a batch cut anywhere invisible (the D36 kernel), and lead-lag
  * correlation must equal a brute per-lag reference with the planted
  * lead recovered. */
class SmoothingSpec extends SparkSuite {
  import spark.implicits._

  private def foldEwma(vs: Seq[Long], aNum: Long, aDen: Long,
                       carry: Option[Long]): Seq[(Long, Option[Long])] = {
    var sm = 0L
    var prev: Option[Long] = carry
    vs.map { v =>
      sm = prev match {
        case None => v * 1000L
        case Some(p) => (aNum * v * 1000L + (aDen - aNum) * p) / aDen
      }
      val out = (sm, prev)
      prev = Some(sm)
      out
    }
  }

  test("C144: the distributed walk equals the sequential fold per series") {
    val rnd = new scala.util.Random(17)
    val a = Seq.fill(40)(rnd.nextInt(1000).toLong)
    val b = Seq.fill(25)(rnd.nextInt(50).toLong)
    val rows = a.zipWithIndex.map { case (v, t) => ("a", t.toLong, v) } ++
      b.zipWithIndex.map { case (v, t) => ("b", t.toLong, v) }
    val got = Smoothing.ewma(rows.toDF("s", "t", "v"), col("s"), col("t"), col("v"),
        aNum = 1L, aDen = 4L)
      .select("series", "t", "sm", "fc")
      .as[(String, Long, Long, Option[Long])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(got("a") == foldEwma(a, 1, 4, None))
    assert(got("b") == foldEwma(b, 1, 4, None))
  }

  test("C144: the carry law — a walk cut anywhere continues the exact same walk") {
    val rnd = new scala.util.Random(19)
    val vs = Seq.fill(30)(rnd.nextInt(500).toLong)
    val full = foldEwma(vs, 1, 4, None)
    for (cut <- Seq(1, 7, 29)) {
      val (head, tail) = vs.splitAt(cut)
      val carry = foldEwma(head, 1, 4, None).last._1
      val rows = tail.zipWithIndex.map { case (v, i) => ("s", (cut + i).toLong, v) }
      val cont = Smoothing.ewma(rows.toDF("s", "t", "v"), col("s"), col("t"), col("v"),
          carried = Some(Seq(("s", carry)).toDF("series", "sm")))
        .select("t", "sm").as[(Long, Long)].collect().sortBy(_._1).map(_._2).toSeq
      assert(cont == full.drop(cut).map(_._1), s"cut at $cut")
    }
  }

  private def bruteLag(xs: Map[Long, Long], ys: Map[Long, Long], lag: Long):
      Option[(Long, Long, Long, Long, Long, Long)] = {
    val pairs = xs.toSeq.flatMap { case (t, x) => ys.get(t + lag).map(y => (x, y)) }
    if (pairs.size < 3) None
    else Some((pairs.size.toLong, pairs.map(_._1).sum, pairs.map(_._2).sum,
      pairs.map(p => p._1 * p._2).sum, pairs.map(p => p._1 * p._1).sum,
      pairs.map(p => p._2 * p._2).sum))
  }

  test("C145: per-lag power sums equal brute force; a planted 3-day lead peaks at lag 3") {
    val rnd = new scala.util.Random(23)
    // y at t+3 is x at t plus noise — corr must peak at lag 3
    val xs = (0L until 40L).map(t => t -> (100 + rnd.nextInt(200)).toLong).toMap
    val ys = (0L until 43L).map(t =>
      t -> (xs.getOrElse(t - 3, 150L) * 3 + rnd.nextInt(20))).toMap
    val got = Smoothing.leadLagCorr(
        xs.toSeq.toDF("t", "x"), ys.toSeq.toDF("t", "y"), maxLag = 7)
      .select("lag", "n", "sx", "sy", "sxy", "sxx", "syy", "corr")
      .as[(Long, Long, Long, Long, java.math.BigDecimal, java.math.BigDecimal,
           java.math.BigDecimal, Option[Double])].collect()
    for (r <- got) {
      val b = bruteLag(xs, ys, r._1).get
      assert((r._2, r._3, r._4, r._5.longValueExact, r._6.longValueExact,
        r._7.longValueExact) == b, s"lag ${r._1}")
    }
    val best = got.maxBy(_._8.get)
    assert(best._1 == 3L, s"planted lead must win: got lag ${best._1}")
    assert(best._8.get > 0.9)
  }

  private def foldHolt(vs: Seq[Long], aN: Long, aD: Long, bN: Long, bD: Long):
      Seq[(Long, Long, Option[Long])] = {
    var l = 0L; var tr = 0L
    vs.zipWithIndex.map { case (v, i) =>
      if (i == 0) { l = v * 1000L; tr = 0L; (l, tr, None) }
      else {
        val fc = l + tr
        val l2 = (aN * v * 1000L + (aD - aN) * fc) / aD
        tr = (bN * (l2 - l) + (bD - bN) * tr) / bD
        l = l2
        (l, tr, Some(fc))
      }
    }
  }

  test("C148: Holt equals the sequential two-scalar fold; tracks a ramp EWMA lags") {
    val rnd = new scala.util.Random(47)
    val noisy = Seq.fill(35)(rnd.nextInt(700).toLong)
    // a clean linear ramp: after burn-in Holt's forecast error must be
    // far below EWMA's (the trend term is the whole point)
    val ramp = (0L until 60L).map(_ * 100L)
    val rows = noisy.zipWithIndex.map { case (v, t) => ("n", t.toLong, v) } ++
      ramp.zipWithIndex.map { case (v, t) => ("r", t.toLong, v) }
    val got = Smoothing.holt(rows.toDF("s", "t", "v"), col("s"), col("t"), col("v"),
        2L, 10L, 1L, 10L)
      .select("series", "t", "level", "trend", "fc")
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(r => (r._3, r._4, r._5)).toSeq).toMap
    assert(got("n") == foldHolt(noisy, 2, 10, 1, 10))
    assert(got("r") == foldHolt(ramp, 2, 10, 1, 10))
    val holtErr = math.abs(ramp.last * 1000L - got("r").last._3.get)
    val ewmaLast = foldEwma(ramp, 2, 10, None).last._2.get
    val ewmaErr = math.abs(ramp.last * 1000L - ewmaLast)
    assert(holtErr * 5 < ewmaErr,
      s"Holt must track the ramp: holt=$holtErr ewma=$ewmaErr")
  }

  test("C145: a constant side yields NULL corr, not NaN") {
    val xs = (0L until 10L).map(t => (t, 5L)).toDF("t", "x")
    val ys = (0L until 10L).map(t => (t, t * 2 + 1)).toDF("t", "y")
    val got = Smoothing.leadLagCorr(xs, ys, maxLag = 1)
      .select("corr").as[Option[Double]].collect()
    assert(got.nonEmpty && got.forall(_.isEmpty))
  }
}
