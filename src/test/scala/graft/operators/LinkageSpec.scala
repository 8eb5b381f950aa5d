package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C118: blocked pair scoring must equal a brute-force reference
  * (pairs, scores, classes), honor null-safe agreement, never cross
  * blocks, and drop over-cap blocks whole. */
class LinkageSpec extends SparkSuite {
  import spark.implicits._

  private val weights = Seq((25L, -12L), (20L, -10L))

  private def brute(rows: Seq[(Long, String, String, String)],
                    upper: Long, lower: Long): Set[(Long, Long, Long, String)] = {
    (for {
      a <- rows; b <- rows if a._1 < b._1 && a._2 == b._2
    } yield {
      val s = (if (a._3 == b._3) weights(0)._1 else weights(0)._2) +
        (if (a._4 == b._4) weights(1)._1 else weights(1)._2)
      (a._1, b._1, s, if (s >= upper) "match" else "possible")
    }).filter(_._3 >= lower).toSet
  }

  test("C118: matches the brute-force reference on a mixed fixture") {
    val rnd = new scala.util.Random(31)
    val rows = Seq.tabulate(200)(i => (i.toLong,
      s"blk${rnd.nextInt(8)}", s"x${rnd.nextInt(4)}", s"y${rnd.nextInt(5)}"))
    val df = rows.toDF("id", "blk", "fx", "fy")
    val got = Linkage.scorePairs(df, col("id"), Seq(col("blk")),
        Seq((col("fx"), 25L, -12L), (col("fy"), 20L, -10L)),
        upper = 40L, lower = 10L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == brute(rows, 40L, 10L))
    assert(got.exists(_._4 == "match") && got.exists(_._4 == "possible"))
  }

  test("C118: pairs never cross blocks; sub-lower pairs never materialize") {
    val rows = Seq((1L, "a", "s", "t"), (2L, "a", "s", "t"),
      (3L, "b", "s", "t"), (4L, "b", "u", "v"))
    val got = Linkage.scorePairs(rows.toDF("id", "blk", "fx", "fy"),
        col("id"), Seq(col("blk")),
        Seq((col("fx"), 25L, -12L), (col("fy"), 20L, -10L)),
        upper = 40L, lower = 10L)
      .as[(Long, Long, Long, String)].collect().toSet
    // (1,2) agree on both inside block a → match; (3,4) disagree on both
    // inside block b → score -22 dropped; (1,3) share fields but not the
    // block → never a candidate
    assert(got == Set((1L, 2L, 45L, "match")))
  }

  test("C118: null-safe agreement — two NULLs agree, NULL vs value disagrees") {
    val rows = Seq(
      (1L, "a", null.asInstanceOf[String], "t"),
      (2L, "a", null.asInstanceOf[String], "t"),
      (3L, "a", "s", "t"))
    val got = Linkage.scorePairs(rows.toDF("id", "blk", "fx", "fy"),
        col("id"), Seq(col("blk")),
        Seq((col("fx"), 25L, -12L), (col("fy"), 20L, -10L)),
        upper = 40L, lower = 0L)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set((1L, 2L, 45L, "match"), (1L, 3L, 8L, "possible"),
      (2L, 3L, 8L, "possible")))
  }

  test("C119: golden-record composition — match pairs cluster transitively, survivorship picks max-value/min-id") {
    // a, b, c chain into ONE entity via transitive match links (a-b and
    // b-c match; a-c never compared across its block is irrelevant —
    // same block here); d is a singleton (no match-grade link)
    val rows = Seq(
      (1L, "blk", "s", "t", 50L), (2L, "blk", "s", "t", 80L),
      (3L, "blk", "s", "t", 80L), (4L, "blk", "u", "v", 99L))
    val matches = Linkage.scorePairs(rows.toDF("id", "blk", "fx", "fy", "bal"),
      col("id"), Seq(col("blk")),
      Seq((col("fx"), 25L, -12L), (col("fy"), 20L, -10L)),
      upper = 40L, lower = 40L)
    val clusters = Dedup.resolveClusters(matches, "id_a", "id_b")
    val got = clusters.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L))) // d absent: singleton
    // survivorship: max bal 80 tie → min id 2
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")
      .orderBy(col("bal").desc, col("id").asc)
    val golden = clusters.withColumnRenamed("doc_id", "id")
      .join(rows.toDF("id", "blk", "fx", "fy", "bal"), "id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select("cluster_id", "id", "bal")
      .as[(Long, Long, Long)].collect().toSet
    assert(golden == Set((1L, 2L, 80L)))
  }

  test("C118: over-cap blocks are dropped whole, small blocks survive") {
    val big = (1L to 50L).map(i => (i, "big", "s", "t"))
    val small = Seq((100L, "sm", "s", "t"), (101L, "sm", "s", "t"))
    val got = Linkage.scorePairs((big ++ small).toDF("id", "blk", "fx", "fy"),
        col("id"), Seq(col("blk")),
        Seq((col("fx"), 25L, -12L), (col("fy"), 20L, -10L)),
        upper = 40L, lower = 0L, blockCap = 10)
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set((100L, 101L, 45L, "match")))
  }
}
