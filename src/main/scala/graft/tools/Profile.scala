package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Dev tool: run one catalog query N times at a given SF dir, print the
  * formatted physical plan and per-run wall time to stderr.
  *
  * Usage: runMain graft.tools.Profile <queryName> [sfDir] [runs]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark: SparkSession = GraftSession.local(32, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    System.err.println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      System.err.println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
