package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Dev tool: run catalog queries N times each at a given SF dir, print the
  * formatted physical plan (optionally to a file per query) and per-run
  * wall time to stderr.
  *
  * Usage: runMain graft.tools.Profile <q1[,q2,...]> [sfDir] [runs] [planDir]
  *
  * With several names the queries share one JVM/session: run 1 of each is
  * that query's in-session cold sample, the last run its warm steady state
  * (the isolated-regression discipline of r10/r11 — one fresh JVM, no
  * catalog aging). When `planDir` is given, each query's
  * explain("formatted") lands in planDir/<name>.txt BEFORE the timed runs.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq.filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val planDir = if (args.length > 3) Some(args(3)) else None
    val spark: SparkSession = GraftSession.local(32, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      planDir match {
        case Some(dir) =>
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$dir/$name.txt"), plan.getBytes("UTF-8"))
        case None => System.err.println(plan)
      }
      for (i <- 1 to runs) {
        spark.sparkContext.setJobDescription(s"$name run $i")
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        System.err.println(f"[profile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
