package graft.tools

import graft.GraftSession
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** Dev scratchpad: time individual pipeline stages while tuning. Body
  * changes freely between experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val t = Tables(spark, sfDir)

    // --- approx_top_k family -------------------------------------------
    val acc = t.orders
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(expr("approx_top_k_accumulate(o_custkey, 100000)").as("state"))
    acc.printSchema()
    val comb = acc.agg(expr("approx_top_k_combine(state, 100000)").as("state"))
    val est = comb.select(explode(expr("approx_top_k_estimate(state, 10)")).as("e"))
    est.printSchema()
    est.show(12, false)

    // exactness check: estimates == exact counts when nothing evicts?
    val estAll = comb.select(explode(expr("approx_top_k_estimate(state, 10000)")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("cnt"))
    val exact = t.orders.groupBy(col("o_custkey").as("item"))
      .agg(count(lit(1)).as("cnt"))
    val diff = estAll.join(exact, Seq("item"), "full_outer")
      .filter(estAll("cnt") =!= exact("cnt") ||
              estAll("cnt").isNull || exact("cnt").isNull)
    println(s"[scratch] mismatches=${diff.count()} est=${estAll.count()} exact=${exact.count()}")

    // --- bloom_filter_agg ----------------------------------------------
    val bloom = t.supplier.filter(col("s_nationkey") === 1)
      .agg(expr("bloom_filter_agg(xxhash64(s_suppkey), 1000L, 65536L)").as("bf"))
    bloom.printSchema()
    println(s"[scratch] bloom bytes=${bloom.collect()(0).getAs[Array[Byte]](0).length}")
    spark.stop()
  }
}
