package graft.sinks

import graft.SparkSuite
import java.nio.file.Files

/** B12 — file sinks round-trip through Spark's distributed writers. */
class SinkSpec extends SparkSuite {
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("graft-sink").toString

  private lazy val df = Seq((1L, "a", 10.5), (2L, "b", 20.0), (3L, "c", -1.0))
    .toDF("id", "name", "value")

  test("ndjson sink writes one JSON object per line") {
    val dir = s"${tmp()}/nd"
    FileSink.ndjson(df, dir)
    val back = spark.read.json(dir)
    assert(back.count() == 3)
    assert(back.columns.sorted.toSeq == Seq("id", "name", "value"))
  }

  test("csv sink honors header and round-trips") {
    val dir = s"${tmp()}/csv"
    FileSink.csv(df, dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == 3)
    assert(back.select("name").as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
  }

  test("parquet sink round-trips exactly") {
    val dir = s"${tmp()}/pq"
    FileSink.parquet(df, dir)
    val back = spark.read.parquet(dir)
    assert(back.collect().toSet == df.collect().toSet)
  }

  test("snapshot layout is partition-prunable by sync and run") {
    val root = tmp()
    val p = FileSink.snapshot(df, root, "sync1", "run1")
    assert(p == s"$root/sync_id=sync1/run_id=run1")
    assert(spark.read.parquet(p).count() == 3)
  }
}
