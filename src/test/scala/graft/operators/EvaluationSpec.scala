package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C147: the U2 identity must equal the brute pairwise probability
  * (pos > neg full credit, ties half) on random data, and hit the
  * analytic anchors: perfect separation = 10⁶, inverted = 0, all-tied
  * scores = exactly 500000, single-class = NULL. */
class EvaluationSpec extends SparkSuite {
  import spark.implicits._

  private def bruteAucPpm(rows: Seq[(Boolean, Long)]): Long = {
    val pos = rows.filter(_._1).map(_._2)
    val neg = rows.filterNot(_._1).map(_._2)
    val u2 = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    (BigInt(1000000) * u2 / (BigInt(2) * pos.size * neg.size)).toLong
  }

  test("C147: equals the brute pairwise AUC with tie half-credit") {
    val rnd = new scala.util.Random(37)
    // heavy ties: scores from a small domain, positives shifted up
    val rows = Seq.fill(800)((rnd.nextBoolean(), 0L)).map { case (y, _) =>
      (y, (rnd.nextInt(12) + (if (y) 3 else 0)).toLong)
    }
    val got = Evaluation.rocAuc(rows.toDF("y", "s"), col("y"), col("s"))
      .select("auc_ppm").as[Long].head()
    assert(got == bruteAucPpm(rows))
  }

  test("C147: analytic anchors — separation, inversion, all-ties, single class") {
    def auc(rows: Seq[(Boolean, Long)]): Option[Long] =
      Evaluation.rocAuc(rows.toDF("y", "s"), col("y"), col("s"))
        .select("auc_ppm").as[Option[Long]].head()
    val sep = (1L to 50L).map(i => (true, 100L + i)) ++ (1L to 50L).map(i => (false, i))
    assert(auc(sep).contains(1000000L))
    assert(auc(sep.map { case (y, s) => (!y, s) }).contains(0L))
    val tied = (1L to 40L).map(i => (i % 2 == 0, 7L))
    assert(auc(tied).contains(500000L))
    assert(auc((1L to 10L).map(i => (true, i))).isEmpty, "no negatives -> NULL")
    // gini = 2*auc - 1
    val g = Evaluation.rocAuc(sep.toDF("y", "s"), col("y"), col("s"))
      .select("gini_ppm").as[Long].head()
    assert(g == 1000000L)
  }
}
