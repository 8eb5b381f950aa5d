package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C115: the closed-form windowed CUSUM must equal the textbook
  * recursion S_t = max(0, S_{t−1} + (x_t − k)) run on the driver, flag a
  * step shift with the right onset/peak localization, and stay flat (0)
  * on constant series. */
class ChangepointSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force reference: the recursion on the ×n-scaled walk
    * (step n·x_t − Σx, so k is the exact mean without division), both
    * sides, with peak + earliest-tie time, onset = latest t with S=0 at
    * or before the peak (None = the virtual origin). */
  private def refCusum(xs: Seq[Long]): (Long, Option[Int], Int, Long, Option[Int], Int) = {
    val n = xs.size.toLong
    val sx = xs.sum
    def side(sign: Long): (Long, Option[Int], Int) = {
      var s = 0L; var peak = 0L; var peakAt = 0
      val states = xs.zipWithIndex.map { case (x, i) =>
        s = math.max(0L, s + sign * (n * x - sx)); (i, s)
      }
      states.foreach { case (i, v) => if (v > peak) { peak = v; peakAt = i } }
      val onset = states.takeWhile(_._1 <= peakAt).filter(_._2 == 0L)
        .lastOption.map(_._1)
      val pm = if (sx > 0) peak * 1000L / (n * sx) else 0L
      (pm, onset, peakAt)
    }
    val (hp, ho, ha) = side(1L)
    val (lp, lo, la) = side(-1L)
    (hp, ho, ha, lp, lo, la)
  }

  private def run(xs: Seq[Long]): (Long, Option[Int], Int, Long, Option[Int], Int) = {
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i, x) }.toDF("k", "t", "x")
    val r = Changepoint.cusum(df, col("k"), col("t"), col("x"))
      .select("high_pm", "high_onset", "high_at", "low_pm", "low_onset", "low_at")
      .collect().head
    (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getInt(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getInt(5))
  }

  test("C115: matches the textbook recursion on a noisy shifted fixture") {
    val rnd = new scala.util.Random(3)
    // level 10 for 40 points, then level 14 — noise ±3
    val xs = Seq.tabulate(40)(_ => 10L + rnd.nextInt(7) - 3) ++
      Seq.tabulate(40)(_ => 14L + rnd.nextInt(7) - 3)
    assert(run(xs) == refCusum(xs))
    // and a downward shift
    val ys = xs.reverse
    assert(run(ys) == refCusum(ys))
  }

  test("C115: clean step shift — upward peak at the end, onset at the change") {
    val xs = Seq.fill(30)(5L) ++ Seq.fill(30)(9L)
    val (hp, ho, ha, lp, lo, la) = run(xs)
    assert((hp, ho, ha, lp, lo, la) == refCusum(xs))
    // the mean-referenced walk descends to its min exactly at the change
    // point (index 29), then climbs to the peak at the series end
    assert(ha == 59 && lo.isEmpty && hp > 0)
    // low side: the walk never rises above the origin before the drop…
    // there IS no drop — low peak is at the change point's trough wrt the
    // running max at the virtual origin
    assert(lp > 0 && la == 29)
  }

  test("C115: constant and empty-adjacent series are flat zeros") {
    val (hp, ho, ha, lp, lo, la) = run(Seq.fill(20)(7L))
    assert(hp == 0L && lp == 0L)
    // every point touches S=0, so onset = the latest (tie-broken) point
    assert(ho.contains(ha) && lo.contains(la))
    // all-zero series: Σx = 0 → defined as 0, not a division error
    val z = run(Seq.fill(5)(0L))
    assert(z._1 == 0L && z._4 == 0L)
  }

  test("D30 kernel: the carried closed form equals the recursion across every cut point") {
    val rnd = new scala.util.Random(9)
    val level = 20L
    val xs = Seq.tabulate(30)(_ => level + rnd.nextInt(11) - 5)
    // recursion truth
    def refAt(upto: Int): (Long, Long) = {
      var h = 0L; var l = 0L
      xs.take(upto).foreach { x =>
        h = math.max(0L, h + (x - level)); l = math.max(0L, l - (x - level))
      }
      (h, l)
    }
    for (cut <- Seq(1, 7, 15, 29)) {
      // first segment from the zero origin
      val seg1 = xs.take(cut).zipWithIndex.map { case (x, i) => ("s", i, x) }
        .toDF("k", "t", "x")
      val st1 = Changepoint.cusumVsReference(seg1, col("k"), col("t"), col("x"), level)
        .select("series", "end_high", "end_low")
      val (h1, l1) = refAt(cut)
      val got1 = st1.as[(String, Long, Long)].collect().head
      assert((got1._2, got1._3) == ((h1, l1)), s"cut $cut seg1: $got1")
      // second segment carried from the first — must land on the
      // unbroken series' end state
      val seg2 = xs.drop(cut).zipWithIndex.map { case (x, i) => ("s", cut + i, x) }
        .toDF("k", "t", "x")
      val carried = st1.select(col("series"),
        col("end_high").as("s_high"), col("end_low").as("s_low"))
      val got2 = Changepoint
        .cusumVsReference(seg2, col("k"), col("t"), col("x"), level, Some(carried))
        .select("end_high", "end_low").as[(Long, Long)].collect().head
      assert(got2 == refAt(xs.size), s"cut $cut: $got2 != ${refAt(xs.size)}")
    }
  }

  test("C115: multiple series stay independent under one partitioned pass") {
    val a = Seq.tabulate(50)(i => if (i < 25) 3L else 8L)
    val b = Seq.tabulate(50)(i => if (i < 25) 8L else 3L)
    val df = (a.zipWithIndex.map { case (x, i) => ("up", i, x) } ++
      b.zipWithIndex.map { case (x, i) => ("down", i, x) }).toDF("k", "t", "x")
    val got = Changepoint.cusum(df, col("k"), col("t"), col("x"))
      .select("series", "high_pm", "low_pm").as[(String, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val refA = refCusum(a); val refB = refCusum(b)
    assert(got("up") == ((refA._1, refA._4)))
    assert(got("down") == ((refB._1, refB._4)))
  }
}
