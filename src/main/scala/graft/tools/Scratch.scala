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

    val sh = docs.select(col("doc_id").as("id"),
        explode(shingles(tokens(col("text")), 3)).as("s"))
      .select(col("id"), xxhash64(col("s")).as("h"))

    time("explode+hash only")(sh.write.format("noop").mode("overwrite").save().asInstanceOf[Any].hashCode())
    val minCols = (0 until 64).map(p => min(xxhash64(col("h"), lit(p))).as(s"m$p"))
    time("64 min aggs")(sh.groupBy("id").agg(minCols.head, minCols.tail: _*).count())
    time("collect_set agg")(sh.groupBy("id").agg(collect_set(col("h")).as("hs")).count())
    time("both in one agg")(sh.groupBy("id")
      .agg(minCols.head, (minCols.tail :+ collect_set(col("h")).as("hs")): _*).count())

    spark.stop()
  }
}
