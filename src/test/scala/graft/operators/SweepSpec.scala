package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The two-level sweep-line must equal ONE global ordered running sum —
  * including across bucket carry-ins and tie groups at one instant. */
class SweepSpec extends SparkSuite {
  import spark.implicits._

  test("runningSum equals the single global window, ties and carry-ins included") {
    // deterministic boundary soup: several rows per bucket, ties on t,
    // mixed +1/-1, buckets with net-positive and net-negative sums
    val rows = (1 to 400).map { i =>
      val t = (i * 7919) % 97           // collides often → tie groups
      val delta = if ((i * 31) % 3 == 0) -1L else 1L
      (t.toLong, delta, i.toLong)
    }
    val df = rows.toDF("t", "delta", "id")
    val got = Sweep.runningSum(df, expr("t div 10"), Seq("t", "delta", "id"), "delta")
      .select("t", "delta", "id", "running")
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3))
    val expected = df
      .withColumn("running", sum(col("delta")).over(
        Window.partitionBy(lit(1)).orderBy(col("t").asc, col("delta").asc, col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq == expected.toSeq)
  }

  test("bucket function may be coarse or fine — same answer") {
    val df = (1 to 100).map(i => ((i % 13).toLong, 1L, i.toLong)).toDF("t", "delta", "id")
    def run(b: String) =
      Sweep.runningSum(df, expr(b), Seq("t", "delta", "id"), "delta")
        .select("id", "running").as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(run("t div 100") == run("t"))
  }
}
