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

  /** A flag-compatible fake container runtime: `pull` records the image,
    * `run` strips the docker flags, exports every `-e` var into the child
    * env and execs `<dir>/<image basename>.sh` — so the protocol traffic
    * crosses the same runtime boundary a real `docker run -i` would. */
  private def writeFakeRuntime(dir: Path, outDir: Path,
                               pullExit: Int = 0): Path =
    writeScript(dir, "fakedocker",
      s"""cmd="$$1"; shift
         |case "$$cmd" in
         |  pull)
         |    echo "$$1" >> "$outDir/pull.log"
         |    exit $pullExit ;;
         |  run)
         |    image=""
         |    while [ $$# -gt 0 ]; do
         |      case "$$1" in
         |        -e) export "$$2"; shift 2 ;;
         |        --add-host|--name) shift 2 ;;
         |        -i|--rm) shift ;;
         |        *) image="$$1"; shift ;;
         |      esac
         |    done
         |    base=$${image##*/}; base=$${base%%:*}
         |    exec /bin/sh "$dir/$$base.sh" ;;
         |esac
         |""".stripMargin)

  test("image config: delivery through the pluggable container runtime (pull, -e env, RPC_URL)") {
    val dir = Files.createTempDirectory("graft-psink")
    val outDir = Files.createTempDirectory("graft-psink-out")
    // the connector the image resolves to — records its env to prove the
    // -e injection crossed the runtime boundary
    writeScript(dir, "dest.sh",
      s"""n=0
         |out="$outDir/lane.$$$$.ndjson"
         |printf 'RPC_URL=%s\\nMY_TOKEN=%s\\n' "$$RPC_URL" "$$MY_TOKEN" > "$outDir/env.$$$$"
         |while IFS= read -r line; do
         |  case "$$line" in
         |    *'"type":"row"'*) n=$$((n+1)); printf '%s\\n' "$$line" >> "$$out" ;;
         |    *'"end-stream"'*)
         |      echo "{\\"type\\":\\"stream-result\\",\\"payload\\":{\\"received\\":$$n,\\"success\\":$$n,\\"skipped\\":0,\\"failed\\":0}}"
         |      exit 0 ;;
         |  esac
         |done
         |""".stripMargin)
    val runtime = writeFakeRuntime(dir, outDir)

    val df = spark.range(20).select(col("id"), concat(lit("user"), col("id")).as("name"))
      .repartition(3)
    val status = ProcessSink.deliver(df,
      ProcessSink.Config(
        image = Some("acme/dest:latest"),
        env = Map("MY_TOKEN" -> "t0"),
        stream = "audience",
        runtime = ContainerRuntime(binary = runtime.toString, rpcHost = "127.0.0.1")))
    status shouldBe Status(20, 20, 0, 0)

    // the reference pulls per container init (container.ts:188-195):
    // one pull per lane, all for the configured image
    val pulls = scala.io.Source.fromFile(s"$outDir/pull.log").getLines().toSeq
    pulls.length shouldBe 3
    pulls.distinct shouldBe Seq("acme/dest:latest")

    // rows crossed the container boundary, one lane per partition
    val lanes = Files.list(outDir).toArray.map(_.toString).filter(_.contains("lane."))
    lanes.length shouldBe 3
    lanes.flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq).length shouldBe 20

    // env injection: the config env and the advertised RPC_URL both
    // arrived as -e vars; the URL names the runtime's rpcHost
    val envs = Files.list(outDir).toArray.map(_.toString).filter(_.contains("env."))
      .flatMap(p => scala.io.Source.fromFile(p).getLines().toSeq)
    envs.count(_ == "MY_TOKEN=t0") shouldBe 3
    // container lanes carry a per-lane capability token in the URL path
    // (the non-loopback bind is guarded; connectors append verbs to the
    // base URL so the token rides along transparently)
    envs.count(_.matches("RPC_URL=http://127\\.0\\.0\\.1:\\d+/[0-9a-f]{32}")) shouldBe 3
  }

  test("state RPC with a token rejects unauthenticated requests, serves tokened ones") {
    import graft.protocol.StateRpc
    import graft.state.StateStore
    val store = StateStore.inMemory()
    store.set(Seq("k"), """{"v":1}""")
    val rpc = new StateRpc(store, bindAll = false, advertiseHost = "127.0.0.1",
      token = Some("cafebabe"))
    try {
      def post(url: String): Int = {
        val c = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        c.setRequestMethod("POST"); c.setDoOutput(true)
        c.getOutputStream.write("""{"key":"k"}""".getBytes("UTF-8"))
        c.getOutputStream.close()
        c.getResponseCode
      }
      rpc.url should endWith("/cafebabe")
      post(s"${rpc.url}/state.get") shouldBe 200
      // no token, wrong token: rejected before the store is touched
      val base = rpc.url.stripSuffix("/cafebabe")
      post(s"$base/state.get") shouldBe 403
      post(s"$base/deadbeef/state.get") shouldBe 403
    } finally rpc.close()
  }

  test("image config: pull failure falls back to the local image; pullPolicy=never skips the pull") {
    val dir = Files.createTempDirectory("graft-psink")
    val outDir = Files.createTempDirectory("graft-psink-out")
    writeScript(dir, "dest.sh",
      """n=0
        |while IFS= read -r line; do
        |  case "$line" in
        |    *'"type":"row"'*) n=$((n+1)) ;;
        |    *'"end-stream"'*)
        |      echo "{\"type\":\"stream-result\",\"payload\":{\"received\":$n,\"success\":$n,\"skipped\":0,\"failed\":0}}"
        |      exit 0 ;;
        |  esac
        |done
        |""".stripMargin)
    val failingPull = writeFakeRuntime(dir, outDir, pullExit = 1)
    val df = spark.range(5).toDF("id").repartition(1)
    // container.ts:188-195: a failed pull logs and proceeds with the local image
    ProcessSink.deliver(df, ProcessSink.Config(
      image = Some("acme/dest:latest"), stream = "s",
      runtime = ContainerRuntime(binary = failingPull.toString, rpcHost = "127.0.0.1")))
      .success shouldBe 5
    scala.io.Source.fromFile(s"$outDir/pull.log").getLines().length shouldBe 1
    // pullPolicy=never: no pull attempt at all
    ProcessSink.deliver(df, ProcessSink.Config(
      image = Some("acme/dest:latest"), stream = "s",
      runtime = ContainerRuntime(binary = failingPull.toString, rpcHost = "127.0.0.1",
        pullPolicy = "never")))
      .success shouldBe 5
    scala.io.Source.fromFile(s"$outDir/pull.log").getLines().length shouldBe 1
  }

  test("ContainerRuntime.launchCommand emits the docker-run flag shape") {
    val rt = ContainerRuntime()
    val cmd = rt.launchCommand("acme/img:1.0", Map("B" -> "2", "A" -> "1"))
    cmd.head shouldBe "docker"
    cmd.slice(1, 4) shouldBe Seq("run", "-i", "--rm")
    cmd.containsSlice(Seq("--add-host", "host.docker.internal:host-gateway")) shouldBe true
    // env flags are sorted, and bare (passthrough) — values must NEVER
    // land in argv, where /proc/<pid>/cmdline makes them world-readable
    cmd.containsSlice(Seq("-e", "A", "-e", "B")) shouldBe true
    cmd.exists(_.contains("=1")) shouldBe false
    cmd.exists(_.contains("=2")) shouldBe false
    cmd.last shouldBe "acme/img:1.0"
    // container names are sanitized and unique per launch
    val name1 = cmd(cmd.indexOf("--name") + 1)
    val name2 = rt.launchCommand("acme/img:1.0", Map.empty)
    name1 should startWith("graft-acme-img-1.0-")
    name1 should not be name2(name2.indexOf("--name") + 1)
    // exactly one of command/image is enforced
    an[IllegalArgumentException] should be thrownBy
      ProcessSink.Config(stream = "s")
    an[IllegalArgumentException] should be thrownBy
      ProcessSink.Config(command = Seq("x"), image = Some("i"), stream = "s")
  }

  test("enrich: the image channel drives enrichment sessions through the fake runtime too") {
    val dir = Files.createTempDirectory("graft-psink")
    val outDir = Files.createTempDirectory("graft-psink-out")
    writeScript(dir, "enr.sh",
      """while IFS= read -r line; do
        |  case "$line" in
        |    *'"enrichment-request"'*)
        |      row=$(printf '%s' "$line" | sed 's/.*"row"://; s/}}$//')
        |      printf '{"type":"enrichment-response","payload":{"row":{"orig":%s,"via":"container"}}}\n' "$row" ;;
        |  esac
        |done
        |""".stripMargin)
    val runtime = writeFakeRuntime(dir, outDir)
    val df = spark.range(4).toDF("id").repartition(2)
    val out = ProcessSink.enrich(df, ProcessSink.Config(
      image = Some("acme/enr:1"), stream = "-",
      runtime = ContainerRuntime(binary = runtime.toString, rpcHost = "127.0.0.1")))
    val tags = out.withColumn("via", get_json_object(col("enriched"), "$.via"))
      .select("via").as[String](org.apache.spark.sql.Encoders.STRING).collect()
    assert(tags.length == 4 && tags.forall(_ == "container"))
    // pulls happened per lane
    scala.io.Source.fromFile(s"$outDir/pull.log").getLines()
      .toSeq.distinct shouldBe Seq("acme/enr:1")
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
