package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C114: the integer ordered-EMD must equal a brute-force driver
  * reference, hit its analytic extremes (0 for a class distributed like
  * the corpus, →1000 for a class concentrated at one end of the
  * domain), and define the single-value domain as 0. */
class PrivacySpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force reference: mean absolute cumulated-probability gap over
    * the sorted global value domain, per-mille, truncating. */
  private def refT(rows: Seq[(String, Long)], cls: String): Long = {
    val inCls = rows.filter(_._1 == cls).map(_._2)
    val vals = rows.map(_._2).distinct.sorted
    val (nc, n, m) = (inCls.size.toLong, rows.size.toLong, vals.size.toLong)
    if (m <= 1) return 0L
    val num = vals.map { v =>
      val cc = inCls.count(_ <= v).toLong
      val cg = rows.count(_._2 <= v).toLong
      (BigInt(cc) * n - BigInt(cg) * nc).abs
    }.sum
    (num * 1000 / (BigInt(nc) * n * (m - 1))).toLong
  }

  test("C114: matches the brute-force reference on a mixed fixture") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(400) { i =>
      val cls = s"c${i % 4}"
      // c0 skews low, c1 uniform, c2 skews high, c3 bimodal
      val v = cls match {
        case "c0" => rnd.nextInt(30).toLong
        case "c1" => rnd.nextInt(100).toLong
        case "c2" => 70L + rnd.nextInt(30)
        case _ => if (rnd.nextBoolean()) rnd.nextInt(10).toLong else 90L + rnd.nextInt(10)
      }
      (cls, v)
    }
    val got = Privacy.tCloseness(rows.toDF("qid", "v"), Seq("qid"), col("v"))
      .select("qid", "t_pm").as[(String, Long)].collect().toMap
    for (c <- Seq("c0", "c1", "c2", "c3"))
      assert(got(c) == refT(rows, c), s"class $c: got ${got(c)}, want ${refT(rows, c)}")
  }

  test("C114: analytic extremes — corpus-shaped class scores 0, end-concentrated class near 1000") {
    // two classes with IDENTICAL distributions: both match the global mix
    val same = (1 to 60).flatMap(i => Seq(("a", i.toLong % 5), ("b", i.toLong % 5)))
    val gotSame = Privacy.tCloseness(same.toDF("qid", "v"), Seq("qid"), col("v"))
      .select("qid", "t_pm").as[(String, Long)].collect().toMap
    assert(gotSame("a") == 0L && gotSame("b") == 0L)
    // a 2-value domain {0, 1}, one class all-0, one all-1, balanced:
    // each class's cumulated gap at v=0 is n/2·n − (n/2)·(n/2)… per-mille
    // EMD = 1000·|1 − 1/2| = 500 with m−1 = 1
    val split = (1 to 50).map(_ => ("zeros", 0L)) ++ (1 to 50).map(_ => ("ones", 1L))
    val gotSplit = Privacy.tCloseness(split.toDF("qid", "v"), Seq("qid"), col("v"))
      .select("qid", "t_pm").as[(String, Long)].collect().toMap
    assert(gotSplit("zeros") == 500L && gotSplit("ones") == 500L, s"$gotSplit")
    // the zeros class against a 99%-ones corpus → EMD → 1000
    val skew = (1 to 10).map(_ => ("zeros", 0L)) ++ (1 to 990).map(_ => ("ones", 1L))
    val gotSkew = Privacy.tCloseness(skew.toDF("qid", "v"), Seq("qid"), col("v"))
      .select("qid", "t_pm").as[(String, Long)].collect().toMap
    assert(gotSkew("zeros") == refT(skew, "zeros") && gotSkew("zeros") == 990L, s"$gotSkew")
  }

  test("C114: single-value domain is 0, not a division error; multi-column classes keep names") {
    val one = Seq(("a", 1, 5L), ("a", 2, 5L), ("b", 1, 5L))
    val got = Privacy.tCloseness(one.toDF("g1", "g2", "v"), Seq("g1", "g2"), col("v"))
    assert(got.columns.toSeq == Seq("g1", "g2", "n_rows", "t_pm"))
    assert(got.select("t_pm").as[Long].collect().forall(_ == 0L))
    assert(got.count() == 3)
  }

  test("C114: a class missing a value entirely still steps its ECDF there (dense grid)") {
    // class "gap" has values {0, 2}; the global domain includes 1 — the
    // cumulated gap at v=1 must be measured (sparse grids miss it)
    val rows = Seq(("gap", 0L), ("gap", 2L), ("full", 0L), ("full", 1L), ("full", 2L))
    val got = Privacy.tCloseness(rows.toDF("qid", "v"), Seq("qid"), col("v"))
      .select("qid", "t_pm").as[(String, Long)].collect().toMap
    assert(got("gap") == refT(rows, "gap") && got("full") == refT(rows, "full"))
    assert(got("gap") > 0L)
  }
}
