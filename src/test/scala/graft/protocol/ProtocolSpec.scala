package graft.protocol

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.nio.file.attribute.PosixFilePermissions

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.protocol.Messages._
import graft.state.StateStore

class ProtocolSpec extends AnyFunSuite with Matchers {

  // ---- message layer -------------------------------------------------

  test("tolerant line parse: plain text and garbage-prefixed JSON (container.ts:46-58)") {
    Messages.parseLine("starting up...") shouldBe Some(Log("info", "starting up..."))
    // leading log prefix before the first '{' is stripped
    Messages.parseLine("""2024-01-01 INFO {"type":"log","payload":{"level":"warn","message":"hi"}}""") shouldBe
      Some(Log("warn", "hi"))
    // JSON-looking but unparsable falls back to a log line
    Messages.parseLine("""{"type": broken""") shouldBe Some(Log("info", """{"type": broken"""))
    // valid JSON of an unknown type is IGNORED, not an error
    Messages.parseLine("""{"type":"telemetry","payload":{}}""") shouldBe None
    Messages.parseLine("   ") shouldBe None
  }

  test("halt is recognized even without its optional type tag (protocol/src/index.ts:171)") {
    Messages.parseLine("""{"payload":{"status":"error","message":"boom"}}""") shouldBe
      Some(Halt("error", Some("boom")))
    Messages.parseLine("""{"payload":{"status":"ok"}}""") shouldBe Some(Halt("ok", None))
    // a random payload without the halt shape stays ignored
    Messages.parseLine("""{"payload":{"status":"weird"}}""") shouldBe None
  }

  test("spec / stream-spec / stream-result decode, incl. per-stream record form") {
    val spec = Messages.parseLine(
      """{"type":"spec","payload":{"roles":["destination"],"connectionCredentials":{"k":1}}}""").get
    spec shouldBe a[ConnectionSpec]
    spec.asInstanceOf[ConnectionSpec].roles shouldBe Seq("destination")

    val ss = Messages.parseLine(
      """{"type":"stream-spec","payload":{"defaultStream":"audience",
        |"streams":[{"name":"audience","rowType":{}},{"name":"events","rowType":{}}]}}""".stripMargin
        .replace("\n", "")).get.asInstanceOf[StreamSpec]
    ss.defaultStream shouldBe "audience"
    ss.streams.map(_.name) shouldBe Seq("audience", "events")

    // single StatusObject form
    Messages.parseLine(
      """{"type":"stream-result","payload":{"received":5,"success":4,"skipped":1,"failed":0}}""")
      .get shouldBe StreamResult(Status(5, 4, 1, 0))
    // record-of-streams form sums (protocol/src/index.ts:149)
    Messages.parseLine(
      """{"type":"stream-result","payload":{
        |"a":{"received":2,"success":2,"skipped":0,"failed":0},
        |"b":{"received":3,"success":1,"skipped":0,"failed":2}}}""".stripMargin.replace("\n", ""))
      .get shouldBe StreamResult(Status(5, 3, 0, 2))
  }

  test("row encoding splices the row JSON without re-encoding") {
    Messages.encode(RowMsg("""{"email":"a@b.c","n":1}""")) shouldBe
      """{"type":"row","payload":{"row":{"email":"a@b.c","n":1}}}"""
    Messages.encode(EndStream("success")) shouldBe """{"type":"end-stream","reason":"success"}"""
  }

  // ---- script connectors over a real process boundary ----------------

  def writeScript(dir: Path, name: String, body: String): Path = {
    val p = dir.resolve(name)
    Files.write(p, ("#!/bin/sh\n" + body).getBytes(StandardCharsets.UTF_8))
    Files.setPosixFilePermissions(p, PosixFilePermissions.fromString("rwxr-xr-x"))
    p
  }

  /** A full destination connector in POSIX sh: describes itself, declares
    * one stream, counts rows, reports the count in stream-result. */
  def destinationScript(dir: Path): Path = writeScript(dir, "dest.sh",
    """n=0
      |while IFS= read -r line; do
      |  case "$line" in
      |    *'"describe"'*)
      |      echo '{"type":"spec","payload":{"roles":["destination"],"connectionCredentials":{}}}' ;;
      |    *'"describe-streams"'*)
      |      echo '{"type":"stream-spec","payload":{"defaultStream":"audience","streams":[{"name":"audience","rowType":{}}]}}' ;;
      |    *'"start-stream"'*) n=0 ;;
      |    *'"type":"row"'*) n=$((n+1)) ;;
      |    *'"end-stream"'*)
      |      echo "{\"type\":\"stream-result\",\"payload\":{\"received\":$n,\"success\":$n,\"skipped\":0,\"failed\":0}}"
      |      exit 0 ;;
      |  esac
      |done
      |""".stripMargin)

  test("describe and describe-streams one-shots against a real child process") {
    val dir = Files.createTempDirectory("graft-proto")
    val script = destinationScript(dir)
    val chan = new StdioConnector(Seq("/bin/sh", script.toString))
    val spec = chan.describe()
    spec.roles shouldBe Seq("destination")
    chan.isRunning shouldBe false // one-shot stops the process

    val streams = chan.streams(DescribeStreams(JObject()))
    streams.defaultStream shouldBe "audience"
    streams.streams.map(_.name) shouldBe Seq("audience")
  }

  test("stream lifecycle: start-stream, rows, end-stream -> stream-result") {
    val dir = Files.createTempDirectory("graft-proto")
    val script = destinationScript(dir)
    val chan = new StdioConnector(Seq("/bin/sh", script.toString))
    chan.startStream(StartStream("audience", syncId = "s1"))
    (1 to 7).foreach(i => chan.row(s"""{"id":$i}"""))
    val result = chan.stopStream()
    result.status shouldBe Status(7, 7, 0, 0)
    chan.isRunning shouldBe false
  }

  test("halt from the connector fails the pending exchange with its message") {
    val dir = Files.createTempDirectory("graft-proto")
    val script = writeScript(dir, "halter.sh",
      """while IFS= read -r line; do
        |  echo '{"type":"halt","payload":{"status":"error","message":"bad credentials"}}'
        |done
        |""".stripMargin)
    val chan = new StdioConnector(Seq("/bin/sh", script.toString))
    val e = intercept[IllegalStateException](chan.describe())
    e.getMessage should include("bad credentials")
  }

  test("non-protocol stdout chatter is surfaced as logs, not errors") {
    val dir = Files.createTempDirectory("graft-proto")
    val script = writeScript(dir, "chatty.sh",
      """echo "booting connector v1.2"
        |while IFS= read -r line; do
        |  case "$line" in
        |    *'"describe"'*)
        |      echo "about to reply"
        |      echo '{"type":"spec","payload":{"roles":["destination"],"connectionCredentials":{}}}' ;;
        |  esac
        |done
        |""".stripMargin)
    val logs = new scala.collection.mutable.ListBuffer[Log]()
    val chan = new StdioConnector(Seq("/bin/sh", script.toString),
      onLog = l => logs.synchronized { logs += l })
    chan.describe().roles shouldBe Seq("destination")
    logs.synchronized(logs.map(_.message)) should contain("booting connector v1.2")
  }

  // ---- state RPC -----------------------------------------------------

  def post(url: String, body: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("POST")
    conn.setDoOutput(true)
    conn.setRequestProperty("Content-Type", "application/json")
    conn.getOutputStream.write(body.getBytes(StandardCharsets.UTF_8))
    new String(conn.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
  }

  test("state RPC verbs over real HTTP (docker-channel.ts:184-208)") {
    val store = StateStore.inMemory()
    val rpc = new StateRpc(store)
    try {
      // set + get, string key
      post(s"${rpc.url}/state.get", """{"key":"cursor"}""") shouldBe "{}" // miss -> {}
      post(s"${rpc.url}/state.set", """{"key":"cursor","value":{"ts":42}}""") shouldBe "{}"
      post(s"${rpc.url}/state.get", """{"key":"cursor"}""") shouldBe """{"ts":42}"""
      // array keys share a prefix
      post(s"${rpc.url}/state.set", """{"key":["sync1","a"],"value":1}""")
      post(s"${rpc.url}/state.set", """{"key":["sync1","b"],"value":2}""")
      post(s"${rpc.url}/state.size", """{"prefix":["sync1"]}""") shouldBe """{"size":2}"""
      val lines = post(s"${rpc.url}/state.list", """{"prefix":["sync1"]}""")
        .split("\n").filter(_.nonEmpty)
      lines should have length 2
      lines.head should include("\"key\"")
      // delete verbs
      post(s"${rpc.url}/state.del", """{"key":["sync1","a"]}""")
      post(s"${rpc.url}/state.size", """{"prefix":["sync1"]}""") shouldBe """{"size":1}"""
      post(s"${rpc.url}/state.deleteByPrefix", """{"prefix":["sync1"]}""")
      post(s"${rpc.url}/state.size", """{"prefix":["sync1"]}""") shouldBe """{"size":0}"""
      store.get(Seq("cursor")) shouldBe Some("""{"ts":42}""")
    } finally rpc.close()
  }

  test("a connector process reaches the state RPC through RPC_URL (curl cursor save)") {
    val dir = Files.createTempDirectory("graft-proto")
    // saves a cursor via the RPC during the stream, like a reference
    // connector checkpointing between syncs
    val script = writeScript(dir, "stateful.sh",
      """n=0
        |while IFS= read -r line; do
        |  case "$line" in
        |    *'"type":"row"'*) n=$((n+1)) ;;
        |    *'"end-stream"'*)
        |      curl -s -X POST "$RPC_URL/state.set" -H 'Content-Type: application/json' \
        |        -d "{\"key\":[\"sync9\",\"cursor\"],\"value\":{\"rows\":$n}}" > /dev/null
        |      echo "{\"type\":\"stream-result\",\"payload\":{\"received\":$n,\"success\":$n,\"skipped\":0,\"failed\":0}}"
        |      exit 0 ;;
        |  esac
        |done
        |""".stripMargin)
    val store = StateStore.inMemory()
    val rpc = new StateRpc(store)
    try {
      val chan = new StdioConnector(Seq("/bin/sh", script.toString),
        env = Map("RPC_URL" -> rpc.url))
      chan.startStream(StartStream("audience", syncId = "sync9"))
      (1 to 3).foreach(i => chan.row(s"""{"id":$i}"""))
      chan.stopStream().status.received shouldBe 3
      store.get(Seq("sync9", "cursor")) shouldBe Some("""{"rows":3}""")
    } finally rpc.close()
  }
}
