ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "syncmavenspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // A 233-query catalog in ONE JVM (Bench, the full test suite) churns
  // thousands of whole-stage-codegen classes; at the JDK-17 default
  // 240 MB ReservedCodeCacheSize the JIT hits "CodeCache is full —
  // compiler disabled" late in the run and everything after executes
  // INTERPRETED: the BENCH_r10 pathology (q60 116 s aged vs <10 s in a
  // fresh JVM — a 30-120x ratio only interpretation explains). The
  // reserve is virtual address space, not committed memory, so 2g is
  // free insurance; flushing stays on as the second line of defense.
  "-XX:ReservedCodeCacheSize=2g",
  "-XX:+UseCodeCacheFlushing",
)

// ---- Parallel test execution across forked JVMs ----
// The r12 driver run was killed by its phase budget with the suite still
// running (~30 min sequential; the entry/correctness phases then never ran
// and the round scored 0 correct). One shared-session JVM serializes 76
// suites on 4 local cores; duration-balanced groups in parallel forked
// JVMs (each group gets its OWN SparkSession via SparkSuite's per-JVM
// lazy init — no shared-state races by construction) bring wall time down
// to the largest group. Buckets sized from the measured per-suite times
// (PlanSpec 365 s post-fix, StreamingSpec 279 s, GraphSpec 215 s,
// RankSpec 168 s, ChunkingSpec 78 s, long tail ~150 s total).
val testBuckets: Map[String, String] = Map(
  "graft.PlanSpec"                    -> "g1-plan",
  "graft.streaming.StreamingSpec"     -> "g2-streaming",
  "graft.operators.GraphSpec"         -> "g3-graph",
  "graft.operators.LineageSpec"       -> "g3-graph",
  "graft.operators.RankSpec"          -> "g4-rank",
  "graft.operators.ChunkingSpec"      -> "g4-rank",
  "graft.operators.DedupSpec"         -> "g5-text",
  "graft.operators.TextAnalysisSpec"  -> "g5-text",
  "graft.project.ProjectSpec"         -> "g5-text",
  "graft.operators.SimilaritySpec"    -> "g5-text",
  "graft.queries.GovernanceProfileSpec" -> "g5-text",
  "graft.operators.SeasonalSpec"      -> "g5-text",
  "graft.operators.SamplingSpec"      -> "g5-text",
  // both Derby-backed specs share one JVM (derby.log writes to cwd)
  "graft.sinks.JdbcSinkSpec"          -> "g6-rest",
  "graft.sources.JdbcSourceSpec"      -> "g6-rest",
)
// Six groups measured best (13m33s wall vs 30m19s sequential); further
// splitting (7-8 groups) was SLOWER under this box's kernel-time churn
// (17-27 min, sys time 77-92 min — mmap/shuffle thrash grows with
// concurrent JVM count).
def restBucket(name: String): String = "g6-rest"
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value
    .groupBy(t => testBuckets.getOrElse(t.name, restBucket(t.name)))
    .map { case (g, ts) =>
      Tests.Group(g, ts, Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }.toSeq
}
// allow all six groups to fork concurrently (each JVM: local[4], -Xmx8g —
// 24 cores / 48 GiB peak on the 32-core / 128 GiB box)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 6),
  Tags.limitAll(16),
)
