package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** B23/B24: membership deltas and the incremental-aggregate merge law. */
class IncrementalAggSpec extends SparkSuite {
  import spark.implicits._

  test("membershipDiff emits only churn, classified add/remove") {
    val prev = Seq(1L, 2L, 3L, 4L).toDF("k")
    val cur = Seq(3L, 4L, 5L).toDF("k")
    val got = Diff.membershipDiff(cur, prev, "k")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "remove"), (2L, "remove"), (5L, "add")))
  }

  test("membershipDiff dedupes multi-row membership evidence") {
    // the same member observed many times in the window is ONE membership
    val prev = Seq(1L, 1L, 2L).toDF("k")
    val cur = Seq(2L, 2L, 2L, 3L).toDF("k")
    val got = Diff.membershipDiff(cur, prev, "k").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "remove"), (3L, "add")))
  }

  test("merge law: any slicing of the input merges to the one-shot aggregate") {
    val keys = Seq("o_orderpriority")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val oneShot = IncrementalAgg.readout(
      IncrementalAgg.buildState(orders, keys, "o_totalprice"), keys)
      .orderBy("o_orderpriority").collect().toSeq
    // three arbitrary disjoint covering slices, merged in two steps
    val s1 = IncrementalAgg.buildState(orders.filter(col("o_orderkey") % 3 === 0), keys, "o_totalprice")
    val s2 = IncrementalAgg.buildState(orders.filter(col("o_orderkey") % 3 === 1), keys, "o_totalprice")
    val s3 = IncrementalAgg.buildState(orders.filter(col("o_orderkey") % 3 === 2), keys, "o_totalprice")
    val merged = IncrementalAgg.readout(
      IncrementalAgg.merge(keys, IncrementalAgg.merge(keys, s1, s2), s3), keys)
      .orderBy("o_orderpriority").collect().toSeq
    assert(merged == oneShot, "merged state must equal the one-shot aggregate bit-for-bit")
  }

  test("state roundtrips through parquet (the persisted-state path)") {
    val keys = Seq("o_orderstatus")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = java.nio.file.Files.createTempDirectory("aggstate").toString
    IncrementalAgg.buildState(orders.filter(col("o_orderkey") % 2 === 0), keys, "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/state")
    val merged = IncrementalAgg.readout(
      IncrementalAgg.merge(keys,
        spark.read.parquet(s"$dir/state"),
        IncrementalAgg.buildState(orders.filter(col("o_orderkey") % 2 === 1), keys, "o_totalprice")),
      keys).orderBy("o_orderstatus").collect().toSeq
    val oneShot = IncrementalAgg.readout(
      IncrementalAgg.buildState(orders, keys, "o_totalprice"), keys)
      .orderBy("o_orderstatus").collect().toSeq
    assert(merged == oneShot)
  }
}
