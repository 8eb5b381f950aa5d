package graft.tools

import graft.GraftSession

/** Dev scratchpad: time individual pipeline stages while tuning. Body
  * changes freely between experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }

    // Scale probe: dedup/ANN cost vs corpus size (multiply sf0.1 by
    // unioning with shifted ids; superlinear growth = red flag).
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, Similarity}
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    for (mult <- Seq(1, 4, 16)) {
      val d = (0 until mult).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))).reduce(_ unionByName _)
      time(s"minhash x$mult (${5000 * mult} docs)")(
        Dedup.minhashPairs(d).count())
      val e = (0 until mult).map(i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))).reduce(_ unionByName _)
      time(s"neardup x$mult (${2000 * mult} vecs)")(
        Similarity.nearDupPairs(e, threshold = 0.4).count())
    }
    spark.stop()
  }
}
