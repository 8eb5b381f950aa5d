package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — times every catalog query end-to-end at
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Each query is fully materialized through the noop sink (count() would
  * let Spark skip computing projected columns). One untimed warmup query
  * absorbs JVM/codegen warmup so numbers reflect steady-state throughput.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus, "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    once("q02_agg") // warmup (untimed)

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> once(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
