package graft.tools

import graft.GraftSession
import graft.queries.Tables
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dev scratchpad: time individual pipeline stages while tuning. Body
  * changes freely between experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val t = Tables(spark, sfDir)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }

    time("embeddings count")(t.embeddings.count())
    for (i <- 1 to 3) {
      time(s"ivfCentroids #$i")(
        Similarity.ivfCentroids(t.embeddings, "vec_id", "embedding", 16).size)
    }
    val queries = t.embeddings.filter(col("vec_id") < 10)
    for (i <- 1 to 3) {
      time(s"ivfTopK full #$i") {
        Similarity.ivfTopK(t.embeddings, queries, k = 10, nlist = 16, nprobe = 4)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
