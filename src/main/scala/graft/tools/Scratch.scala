package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.TextOps._

/** Dev scratchpad: time individual pipeline stages while tuning. Body
  * changes freely between experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  (n=$n)")
    }

    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("m"),
           expr("percentile(o_totalprice, 0.9)").as("p90"))
      .orderBy("o_orderstatus")
      .collect().foreach(r => println(s"[scratch] ${r.getString(0)} ${r.getDouble(1)} ${r.getDouble(2)}"))

    spark.stop()
  }
}
