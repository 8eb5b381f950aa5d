package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

import graft.SparkSuite
import graft.protocol.Messages.Status

/** Process-connector delivery end-to-end: real child processes per
  * partition, rows over stdio, aggregated stream-result counts, the
  * error-threshold abort, and the enrichment round-trip. */
class ProcessSinkSpec extends SparkSuite with Matchers {

  def writeScript(dir: Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, ("#!/bin/sh\n" + body).getBytes(StandardCharsets.UTF_8))
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p
  }

  test("deliver: one connector process per partition, counts aggregate across lanes") {
    val dir = Files.createTempDirectory("graft-psink")
    val outDir = Files.createTempDirectory("graft-psink-out")
    // writes every row line into a per-process file: proves rows crossed
    // the process boundary, and the file count proves per-partition lanes
    val script = writeScript(dir, "dest.sh",
      s"""n=0
         |out="$outDir/lane.$$$$.ndjson"
         |while IFS= read -r line; do
         |  case "$$line" in
         |    *'"type":"row"'*) n=$$((n+1)); printf '%s\\n' "$$line" >> "$$out" ;;
         |    *'"end-stream"'*)
         |      echo "{\\"type\\":\\"stream-result\\",\\"payload\\":{\\"received\\":$$n,\\"success\\":$$n,\\"skipped\\":0,\\"failed\\":0}}"
         |      exit 0 ;;
         |  esac
         |done
         |""".stripMargin)

    val df = spark.range(20).select(col("id"), concat(lit("user"), col("id")).as("name"))
      .repartition(3)
    val status = ProcessSink.deliver(df,
      ProcessSink.Config(command = Seq("/bin/sh", script.toString), stream = "audience"))
    status shouldBe Status(20, 20, 0, 0)

    val lanes = Files.list(outDir).toArray.map(_.toString).filter(_.endsWith(".ndjson"))
    lanes.length shouldBe 3 // one process per non-empty partition
    val all = lanes.flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
    all.length shouldBe 20
    all.foreach(_ should include(""""type":"row""""))
    // row payloads are the Spark JSON projection of the input columns
    all.count(_.contains(""""name":"user7"""")) shouldBe 1
  }

  test("deliver: the reference error threshold aborts the sync (error-threshold.ts)") {
    val dir = Files.createTempDirectory("graft-psink")
    // connector reports every row as failed
    val script = writeScript(dir, "failing.sh",
      """n=0
        |while IFS= read -r line; do
        |  case "$line" in
        |    *'"type":"row"'*) n=$((n+1)) ;;
        |    *'"end-stream"'*)
        |      echo "{\"type\":\"stream-result\",\"payload\":{\"received\":$n,\"success\":0,\"skipped\":0,\"failed\":$n}}"
        |      exit 0 ;;
        |  esac
        |done
        |""".stripMargin)
    val df = spark.range(120).toDF("id").repartition(2)
    val e = intercept[IllegalStateException] {
      ProcessSink.deliver(df,
        ProcessSink.Config(command = Seq("/bin/sh", script.toString), stream = "s"))
    }
    e.getMessage should include("error threshold")
    // below the 100-row observation floor the same ratio does NOT abort
    val small = spark.range(10).toDF("id").repartition(2)
    ProcessSink.deliver(small,
      ProcessSink.Config(command = Seq("/bin/sh", script.toString), stream = "s"))
      .failed shouldBe 10
  }

  test("preflight validates the configured stream against describe-streams") {
    val dir = Files.createTempDirectory("graft-psink")
    val script = writeScript(dir, "dest.sh",
      """while IFS= read -r line; do
        |  case "$line" in
        |    *'"describe-streams"'*)
        |      echo '{"type":"stream-spec","payload":{"defaultStream":"audience","streams":[{"name":"audience","rowType":{}}]}}' ;;
        |    *'"describe"'*)
        |      echo '{"type":"spec","payload":{"roles":["destination"],"connectionCredentials":{}}}' ;;
        |  esac
        |done
        |""".stripMargin)
    val ok = ProcessSink.Config(command = Seq("/bin/sh", script.toString), stream = "audience")
    val (spec, streams) = ProcessSink.preflight(ok)
    spec.roles shouldBe Seq("destination")
    streams.defaultStream shouldBe "audience"
    val bad = ok.copy(stream = "nope")
    val e = intercept[IllegalArgumentException](ProcessSink.preflight(bad))
    e.getMessage should include("does not declare stream 'nope'")
  }

  test("enrich: per-partition keep-alive sessions round-trip every row in order") {
    val dir = Files.createTempDirectory("graft-psink")
    // echoes the request row back enriched with a literal tag; the row
    // JSON is extracted with sed — a real parse across the process
    // boundary, not an engine-side shortcut
    val script = writeScript(dir, "enricher.sh",
      """while IFS= read -r line; do
        |  case "$line" in
        |    *'"enrichment-request"'*)
        |      row=$(printf '%s' "$line" | sed 's/.*"row"://; s/}}$//')
        |      printf '{"type":"enrichment-response","payload":{"row":{"orig":%s,"tag":"seen"}}}\n' "$row" ;;
        |  esac
        |done
        |""".stripMargin)
    val df = spark.range(6).select(col("id"), (col("id") * 10).as("v")).repartition(2)
    val out = ProcessSink.enrich(df,
      ProcessSink.Config(command = Seq("/bin/sh", script.toString), stream = "-"))
    out.columns.toSeq shouldBe Seq("id", "v", "enriched")
    val parsed = out.withColumn("tag", get_json_object(col("enriched"), "$.tag"))
      .withColumn("echoed", get_json_object(col("enriched"), "$.orig.id").cast("long"))
    parsed.filter(col("tag") === "seen").count() shouldBe 6
    // the enriched payload corresponds row-for-row to its input
    parsed.filter(col("echoed") === col("id")).count() shouldBe 6
  }
}
