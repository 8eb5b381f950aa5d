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
    // Job-level accounting: #jobs, Σ job wall, Σ task time per timed run —
    // the gap between run wall and Σ job wall is driver-side work
    // (planning/optimizing/codegen lookup), which plan dumps cannot show.
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val jobWallMs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, j.time)
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        jobs.incrementAndGet()
        Option(starts.remove(j.jobId)).foreach(t0 => jobWallMs.addAndGet(j.time - t0))
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
    })
    // Optional per-operator metrics dump (PROFILE_NODE_METRICS=1): after
    // each action, walk the executed (post-AQE) plan and print every
    // node's simpleString with its metric values — the SQL-tab view the
    // disabled UI cannot show. Only nodes with a nonzero "time" metric
    // matter; sort client-side.
    val dumpMetrics = sys.env.get("PROFILE_NODE_METRICS").contains("1")
    if (dumpMetrics)
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = {
          def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
            val interesting = p.metrics.filter { case (k, m) =>
              m.value > 0 && (k.contains("time") || k.contains("Time") ||
                k == "numOutputRows" || k.contains("spill") || k.contains("build"))
            }
            if (interesting.nonEmpty)
              System.err.println("[node] " + p.nodeName + " :: " +
                interesting.map { case (k, m) => s"$k=${m.value}" }.mkString(" "))
            p.children.foreach(walk)
            p match {
              case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
                walk(a.executedPlan)
              case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
                walk(q.plan)
              case _ => ()
            }
          }
          System.err.println(s"[qe] $funcName ${durationNs / 1e9}%s")
          walk(qe.executedPlan)
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
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
        // Bench methodology: trigger ContextCleaner between runs so a
        // prior run's (dereferenced) persisted frames cannot be
        // plan-matched by CacheManager into this run's execution —
        // without this, "warm" samples of persist-using queries measure
        // cache hits, not recomputation.
        System.gc()
        spark.sparkContext.setJobDescription(s"$name run $i")
        val (j0, w0, m0) = (jobs.get, jobWallMs.get, taskMs.get)
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        // listener events are async; give the bus a beat before reading
        Thread.sleep(300)
        System.err.println(f"[profile] $name run $i: $wall%.3f s  " +
          f"jobs=${jobs.get - j0} jobWall=${(jobWallMs.get - w0) / 1e3}%.2fs " +
          f"taskTime=${(taskMs.get - m0) / 1e3}%.2fs")
      }
    }
    spark.stop()
  }
}
