package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** B21 — the bloom prefilter must be semantically invisible (exact semi
  * join result) while actually pruning the fact side before the join. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("bloomSemiJoin equals the plain semi join exactly") {
    val audience = customer.filter(col("c_mktsegment") === "BUILDING")
    val got = BloomJoin.bloomSemiJoin(orders, audience, "o_custkey", "c_custkey")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val want = orders
      .join(audience, orders("o_custkey") === audience("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(got == want, "false positives must die in the exact join")
  }

  test("the bloom prefilter prunes non-members before the join") {
    val audience = customer.filter(col("c_custkey") % 100 === 0) // ~1% of keys
    val bytes = BloomJoin.buildBloom(audience, "c_custkey", 10000L, 1048576L)
    val pre = orders.filter(BloomJoin.mightContain(bytes, col("o_custkey"))).count()
    val total = orders.count()
    val hits = orders.join(audience, orders("o_custkey") === audience("c_custkey"), "left_semi").count()
    assert(pre < total / 10, s"prefilter must prune most rows: kept $pre of $total")
    assert(pre >= hits, "prefilter may never drop a true member")
  }

  test("empty dim side yields an empty semi join, not a crash") {
    val none = customer.filter(lit(false))
    assert(BloomJoin.bloomSemiJoin(orders, none, "o_custkey", "c_custkey").count() == 0)
  }
}
