package graft.queries

import graft.SparkSuite

/** A38/A39 interval analytics and the C84/C85/B43 governance profiles:
  * brute-force replays on the sf0.001 tables (small enough to recompute
  * in-process) plus the structural invariants each contract states. */
class GovernanceProfileSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  test("A38 q158: per-day peaks match a brute-force sweep over all boundaries") {
    val sessions = Events.sessionIntervals(t)
      .as[(Long, Long, Long, Long)].collect() // user, seq, start, end
    val bounds = sessions.flatMap { case (u, s, lo, hi) =>
      Seq((lo, 1L, u, s), (hi + 1, -1L, u, s))
    }.sortBy(b => (b._1, b._2, b._3, b._4))
    var run = 0L
    val perDay = collection.mutable.Map[Long, (Long, Long, Long)]()
    bounds.foreach { case (tUs, d, _, _) =>
      run += d
      val day = Math.floorDiv(tUs, 86400000000L)
      val (pk, st, en) = perDay.getOrElse(day, (Long.MinValue, 0L, 0L))
      perDay(day) = (math.max(pk, run),
        st + (if (d == 1) 1 else 0), en + (if (d == -1) 1 else 0))
    }
    val expected = perDay.toSeq.map { case (d, (p, s, e)) => (d, p, s, e) }.sortBy(_._1)
    val got = Events.q158Concurrency(t).as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
    assert(got.map(_._3).sum == got.map(_._4).sum, "every start eventually ends")
  }

  test("A39 q159: streak summary matches a per-user recomputation") {
    val days = t.events
      .selectExpr("user_id", "(ts div 1000) div 86400000000 as day")
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toVector).toMap
    val exp2 = days.toSeq.map { case (u, ds) =>
      val islands = collection.mutable.ArrayBuffer[(Long, Long)]() // start, len
      ds.foreach { d =>
        if (islands.nonEmpty && islands.last._1 + islands.last._2 == d)
          islands(islands.size - 1) = (islands.last._1, islands.last._2 + 1)
        else islands += ((d, 1L))
      }
      val longest = islands.maxBy(i => (i._2, -i._1))
      (u, ds.size.toLong, islands.size.toLong, longest._2, longest._1)
    }.sortBy(_._1)
    val got = Events.q159Streaks(t).as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == exp2)
  }

  test("C84 q160: buckets partition the table; shares are row-weighted") {
    val got = TrainingData.q160KAnonymity(t)
      .as[(String, Long, Long, Long)].collect().toSeq
    val total = t.customer.count()
    assert(got.map(_._3).sum == total, "bucket rows cover every customer")
    got.foreach { case (_, nc, nr, pm) =>
      assert(nc <= nr)
      assert(pm == nr * 1000 / total)
    }
  }

  test("C112 q192: l-diversity buckets match a brute-force class recomputation") {
    val rows = t.customer
      .selectExpr("c_nationkey", "c_mktsegment",
        "cast(floor(c_acctbal / 1000.0) as long) as band")
      .as[(Long, String, Long)].collect()
    val classes = rows.groupBy(r => (r._1, r._2)).view.mapValues { rs =>
      (rs.map(_._3).distinct.size.toLong, rs.size.toLong)
    }.toMap
    val total = rows.size.toLong
    val want = classes.values.groupBy(_._1).map { case (l, vs) =>
      val nRows = vs.map(_._2).sum
      (l, vs.size.toLong, nRows, 1000L * nRows / total)
    }.toSeq.sortBy(_._1)
    val got = TrainingData.q192LDiversity(t)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    // every row lands in exactly one bucket
    assert(got.map(_._3).sum == total)
  }

  test("C85 q161: rank runs tile 1..V with no gaps, Zipf products ordered") {
    val got = TrainingData.q161ZipfProfile(t)
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq
    val v = got.map(_._2).sum // total distinct terms
    // rows arrive freq-desc = rank-asc; runs must tile [1, V]
    var next = 1L
    got.foreach { case (c, n, lo, hi, zlo, zhi, _) =>
      assert(lo == next, s"rank run for c=$c starts at $lo, expected $next")
      assert(hi == lo + n - 1)
      assert(zlo == c * lo && zhi == c * hi)
      next = hi + 1
    }
    assert(next - 1 == v)
  }

  test("B45 q166: cascade audit matches a direct recomputation") {
    val reqs = t.customer.filter($"c_acctbal" < -800)
      .select("c_custkey").as[Long].collect().toSet
    val ordKeys = t.orders.select("o_custkey", "o_orderkey").as[(Long, Long)]
      .collect().filter(r => reqs(r._1)).map(_._2)
    val ordSet = ordKeys.toSet
    val itemKeys = t.lineitem.select("l_orderkey").as[Long]
      .collect().filter(ordSet)
    val got = ReverseEtl.q166DeletionSweep(t)
      .as[(String, Long, Long, Option[Long], Option[Long])].collect().toSeq
    def row(n: String) = got.find(_._1 == n).get
    assert(row("customer")._2 == reqs.size && row("customer")._3 == reqs.sum)
    assert(row("orders")._2 == ordKeys.length && row("orders")._3 == ordKeys.sum)
    assert(row("lineitem")._2 == itemKeys.length && row("lineitem")._3 == itemKeys.sum)
    assert(row("orders")._4 == (if (ordKeys.isEmpty) None else Some(ordKeys.min)))
    assert(reqs.nonEmpty && ordKeys.nonEmpty && itemKeys.nonEmpty,
      "the fixture predicate must actually select subjects at sf0.001")
  }

  test("B43 q162: shares are exact integer ppm and TVD is half the gap sum") {
    val got = ReverseEtl.q162DriftAudit(t)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val tOld = got.map(_._2).sum
    val tNew = got.map(_._3).sum
    got.foreach { case (_, nOld, nNew, so, sn, gap, _) =>
      assert(so == nOld * 1000000L / tOld)
      assert(sn == nNew * 1000000L / tNew)
      assert(gap == math.abs(sn - so))
    }
    val tvd = got.head._7
    assert(got.forall(_._7 == tvd), "tvd is one scalar on every row")
    assert(tvd == got.map(_._6).sum / 2)
  }
}
