package graft.cli

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSuite
import graft.project.ProjectLoader
import graft.sinks.RestSink

import scala.collection.mutable.ArrayBuffer

/** The CLI command surface (commands/index.ts:92-236) driven in-process:
  * every command through [[Cli.run]] with a captured out stream, plus the
  * real [[RestSink.HttpTransport]] against a local JDK HttpServer — the
  * full `sync` path exercises model → validate → batch → HTTP POST wire
  * delivery end-to-end. */
class CliSpec extends SparkSuite {

  private def cli(args: String*): (Int, Seq[String]) = {
    val buf = ArrayBuffer.empty[String]
    val code = Cli.run(args, buf += _, () => spark)
    (code, buf.toSeq)
  }

  private def tmp(): String = Files.createTempDirectory("graft-cli").toString

  test("init scaffolds the project skeleton; a non-empty dir is refused") {
    val dir = tmp()
    val (code, out) = cli("init", dir)
    assert(code == 0 && out.exists(_.contains("Created graft project")))
    assert(Files.isDirectory(Paths.get(dir, "models")))
    assert(Files.isDirectory(Paths.get(dir, "syncs")))
    assert(Files.isDirectory(Paths.get(dir, "connections")))
    assert(new String(Files.readAllBytes(Paths.get(dir, ".gitignore"))) == ".env\n.state")
    val (code2, out2) = cli("init", dir)
    assert(code2 == 1 && out2.exists(_.contains("not empty")))
  }

  test("add connection validates credentials against the kind's schema and writes a loadable file") {
    val dir = tmp()
    cli("init", dir)
    // missing required key
    val (bad, badOut) = cli("add", "connection", "syncmaven/mixpanel", "-d", dir,
      "-c", """{"residency": "EU"}""")
    assert(bad == 1 && badOut.exists(_.contains("missing required credential 'projectToken'")))
    // bad enum value
    val (badEnum, enumOut) = cli("add", "connection", "syncmaven/mixpanel", "-d", dir,
      "-c", """{"projectToken": "t1", "residency": "MARS"}""")
    assert(badEnum == 1 && enumOut.exists(_.contains("must be one of EU|US")))
    // typo'd key is rejected, not silently ignored
    val (badKey, keyOut) = cli("add", "connection", "syncmaven/hubspot", "-d", dir,
      "-c", """{"accessToken": "t", "acessToken": "t"}""")
    assert(badKey == 1 && keyOut.exists(_.contains("unknown credential 'acessToken'")))
    // valid — file lands, project loads it, id dedups on re-add
    val (ok, okOut) = cli("add", "connection", "syncmaven/mixpanel", "-d", dir,
      "-c", """{"projectToken": "t1", "residency": "EU", "batchSize": 500}""")
    assert(ok == 0 && okOut.exists(_.contains("Available streams: ads")))
    val (ok2, _) = cli("add", "connection", "syncmaven/mixpanel", "-d", dir,
      "-c", """{"projectToken": "t2"}""")
    assert(ok2 == 0 && Files.exists(Paths.get(dir, "connections", "mixpanel-1.yml")))
    val p = ProjectLoader.load(dir)
    assert(p.connections("mixpanel").kind == "mixpanel")
    assert(p.connections("mixpanel").credentials("projectToken") == "t1")
    assert(p.connections("mixpanel").credentials("batchSize") == 500L ||
      p.connections("mixpanel").credentials("batchSize") == 500)
  }

  test("destination describes credential parameters, --json emits draft-07") {
    val (code, out) = cli("destination", "-p", "syncmaven/mixpanel")
    assert(code == 0 && out.exists(_.contains("projectToken: string, required")))
    val (jc, jout) = cli("destination", "-p", "mixpanel", "--json")
    assert(jc == 0)
    import org.json4s._
    val schema = org.json4s.jackson.JsonMethods.parse(jout.mkString)
    assert((schema \ "required") == JArray(List(JString("projectToken"))))
    assert((schema \ "properties" \ "residency" \ "enum") ==
      JArray(List(JString("EU"), JString("US"))))
  }

  test("streams prints the catalog by package name or by project connection id") {
    val (code, out) = cli("streams", "syncmaven/hubspot")
    assert(code == 0)
    assert(out.exists(_.contains("contacts")) && out.exists(_.contains("companies")))
    assert(out.exists(l => l.contains("email") && l.contains("required")))
    // via connection id in a project dir
    val dir = tmp()
    cli("init", dir)
    cli("add", "connection", "syncmaven/resend", "-d", dir, "-c", """{"apiKey": "k"}""")
    val (c2, out2) = cli("streams", "resend", "-d", dir)
    assert(c2 == 0 && out2.exists(_.contains("audience")))
  }

  test("link creates a sync file the loader reads back; ids dedup") {
    val dir = makeParquetProject()
    val (code, out) = cli("link", "-d", dir, "-c", "hook", "-m", "nations")
    assert(code == 0 && out.exists(_.contains("Sync hook-nations created")))
    val (c2, _) = cli("link", "-d", dir, "-c", "hook", "-m", "nations")
    assert(c2 == 0 && Files.exists(Paths.get(dir, "syncs", "hook-nations-1.yml")))
    val p = ProjectLoader.load(dir)
    assert(p.syncs("hook-nations").model == "nations")
    assert(p.syncs("hook-nations").destination == "hook")
    // unknown model fails loudly
    val (bad, badOut) = cli("link", "-d", dir, "-c", "hook", "-m", "nope")
    assert(bad == 1 && badOut.exists(_.contains("Model nope not found")))
  }

  test("preview renders the first rows as a table and notes truncation") {
    val dir = makeParquetProject()
    val (code, out) = cli("preview", "nations", "-d", dir, "-n", "5")
    assert(code == 0)
    assert(out.head.contains("n_name") && out.head.contains("n_nationkey"))
    assert(out.count(_.startsWith("| ")) == 6) // header + 5 rows
    assert(out.last.contains("truncated to 5 rows"))
  }

  test("sync --plan prices each selected sync without moving rows") {
    val dir = makeParquetProject()
    cli("link", "-d", dir, "-c", "hook", "-m", "nations")
    val (code, out) = cli("sync", dir, "--plan", "-s", "hook-nations")
    assert(code == 0)
    assert(out.exists(l => l.contains("hook-nations") && l.contains("25 rows") &&
      l.contains("1 batch(es)")))
  }

  test("sync delivers over real HTTP: batches post as JSON arrays with auth headers") {
    val dir = makeParquetProject()
    cli("link", "-d", dir, "-c", "hook", "-m", "nations")
    val received = ArrayBuffer.empty[(String, String)] // (api-key header, body)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/hook", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes, "UTF-8")
      received.synchronized {
        received += ((ex.getRequestHeaders.getFirst("X-Api-Key"), body))
      }
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      // point the connection at the local server via options.url
      val conn = Paths.get(dir, "connections", "hook.yml")
      Files.write(conn, (new String(Files.readAllBytes(conn), "UTF-8") +
        s"\noptions:\n  url: \"http://127.0.0.1:$port/hook\"").getBytes("UTF-8"))
      val (code, out) = cli("sync", dir, "-s", "hook-nations")
      assert(code == 0, out.mkString("\n"))
      assert(out.exists(_.contains("25/25 rows delivered")))
      val rows = received.synchronized { received.toSeq }
      assert(rows.map(_._1).distinct == Seq("k1"))
      import org.json4s._
      val all = rows.flatMap { case (_, b) =>
        org.json4s.jackson.JsonMethods.parse(b).asInstanceOf[JArray].arr }
      assert(all.length == 25)
      assert(all.forall(o => (o \ "n_name") != JNothing))
    } finally server.stop(0)
  }

  test("HttpTransport converts 429 to RateLimited honoring Retry-After; 5xx throws") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/limited", (ex: HttpExchange) => {
      ex.getResponseHeaders.add("Retry-After", "2")
      ex.sendResponseHeaders(429, -1); ex.close()
    })
    server.createContext("/boom", (ex: HttpExchange) => {
      ex.sendResponseHeaders(500, -1); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val limited = RestSink.HttpTransport(s"http://127.0.0.1:$port/limited")
      val e = intercept[RestSink.RateLimited] { limited.send(Seq(Map("a" -> 1))) }
      assert(e.retryAfterMs == 2000L)
      val boom = RestSink.HttpTransport(s"http://127.0.0.1:$port/boom")
      val e2 = intercept[RuntimeException] { boom.send(Seq(Map("a" -> 1))) }
      assert(e2.getMessage.contains("HTTP 500"))
    } finally server.stop(0)
  }

  test("streams asks a command connection's LIVE connector via describe-streams") {
    val dir = tmp()
    cli("init", dir)
    def write(rel: String, text: String): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, text.getBytes("UTF-8"))
      ()
    }
    write("connector.sh",
      """#!/bin/sh
        |while IFS= read -r line; do
        |  case "$line" in
        |    *'"describe-streams"'*)
        |      echo '{"type":"stream-spec","payload":{"defaultStream":"contacts","streams":[{"name":"contacts","rowType":{"type":"object","required":["email"],"properties":{"email":{"type":"string"},"age":{"type":"integer"}}}},{"name":"companies","rowType":{}}]}}' ;;
        |    *'"describe"'*)
        |      echo '{"type":"spec","payload":{"roles":["destination"],"connectionCredentials":{}}}' ;;
        |  esac
        |done
        |""".stripMargin)
    Files.setPosixFilePermissions(Paths.get(dir, "connector.sh"),
      java.nio.file.attribute.PosixFilePermissions.fromString("rwxr-xr-x"))
    write("connections/live_dest.yml",
      """package:
        |  type: npm
        |  command: /bin/sh connector.sh
        |  dir: .
        |credentials:
        |  apiKey: "k"
        |""".stripMargin)
    val (code, out) = cli("streams", "live_dest", "-d", dir)
    assert(code == 0, out.mkString("\n"))
    assert(out.exists(_.contains("live connector")), "must query the connector, not the registry")
    assert(out.exists(_.contains("2 stream(s)")) && out.exists(_.contains("default 'contacts'")))
    assert(out.exists(_.trim == "contacts") && out.exists(_.trim == "companies"))
    assert(out.exists(_.contains("email: string (required)")))
    assert(out.exists(_.contains("age: integer")))
  }

  test("ad-hoc sync: -p/-m/-c runs one sync with no project directory") {
    val received = ArrayBuffer.empty[String]
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/adhoc", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes, "UTF-8")
      received.synchronized { received += body }
      ex.sendResponseHeaders(200, -1); ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val state = Files.createTempFile("graft-adhoc-state", ".json").toString
      val model =
        s"""--{{ config "datasource" "parquet:$sfDir" }}
           |--{{ config "cursor" "o_orderdate" }}
           |--{{ config "primaryKey" "o_orderkey" }}
           |SELECT o_orderkey, o_orderdate FROM orders
           |WHERE :cursor IS NULL OR o_orderdate > :cursor
           |""".stripMargin
      val (code, out) = cli("sync",
        "-p", "syncmaven/http", "-m", model,
        "-c", s"""{"url": "http://127.0.0.1:$port/adhoc"}""",
        "--sync-id", "adhoc_orders", "--state", state)
      assert(code == 0, out.mkString("\n"))
      assert(out.exists(_.contains("adhoc_orders:")), out.mkString("\n"))
      val n = received.synchronized { received.size }
      assert(n > 0, "rows must reach the HTTP destination")
      // cursor state persisted under --sync-id: the re-run is an empty increment
      val (code2, out2) = cli("sync",
        "-p", "syncmaven/http", "-m", model,
        "-c", s"""{"url": "http://127.0.0.1:$port/adhoc"}""",
        "--sync-id", "adhoc_orders", "--state", state)
      assert(code2 == 0 && out2.exists(_.contains("0/0 rows delivered")), out2.mkString("\n"))
      assert(received.synchronized(received.size) == n, "no re-delivery on resume")
      // --plan is a dry run in ad-hoc mode too: prices, never delivers
      val (pc, pOut) = cli("sync",
        "-p", "syncmaven/http", "-m", model,
        "-c", s"""{"url": "http://127.0.0.1:$port/adhoc"}""",
        "--sync-id", "adhoc_plan_only", "--state", state, "--plan")
      assert(pc == 0 && pOut.exists(l => l.contains("adhoc_plan_only") && l.contains("rows in")),
        pOut.mkString("\n"))
      assert(received.synchronized(received.size) == n, "--plan must not deliver")
      // missing package fails loudly
      val (bad, badOut) = cli("sync", "-m", model, "-c", "{}")
      assert(bad == 1 && badOut.exists(_.contains("needs -p")))
    } finally server.stop(0)
  }

  test("connector-dev runs a dev sync against a script connector with durable state") {
    val dir = tmp() // the connector-under-development's working tree
    val outDir = tmp()
    def write(rel: String, text: String): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.write(p, text.getBytes("UTF-8"))
      ()
    }
    // connector-dev.ts:28-36: the dir must look like a connector package
    write("package.json", """{"name": "dev-connector", "main": "connector.sh"}""")
    write("connector.sh",
      s"""#!/bin/sh
         |n=0
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
    Files.setPosixFilePermissions(Paths.get(dir, "connector.sh"),
      java.nio.file.attribute.PosixFilePermissions.fromString("rwxr-xr-x"))
    // explicit model + connection files, not a project layout
    write("dev-model.sql",
      s"""--{{ config "datasource" "parquet:$sfDir" }}
         |--{{ config "cursor" "o_orderdate" }}
         |--{{ config "primaryKey" "o_orderkey" }}
         |SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
         |WHERE :cursor IS NULL OR o_orderdate > :cursor
         |""".stripMargin)
    write("dev-connection.yaml",
      """package:
        |  type: npm
        |  command: /bin/sh connector.sh
        |  dir: .
        |credentials:
        |  apiKey: "k"
        |""".stripMargin)

    val (code, out) = cli("connector-dev", dir,
      "-m", s"$dir/dev-model.sql", "-c", s"$dir/dev-connection.yaml")
    assert(code == 0, out.mkString("\n"))
    assert(out.exists(_.contains("Running sync sync with model dev-model")))
    val delivered = new java.io.File(outDir).listFiles()
      .filter(_.getName.endsWith(".ndjson"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines().toSeq)
    assert(delivered.nonEmpty && delivered.forall(_.contains("\"o_orderkey\"")))
    assert(out.exists(l => l.contains(s"${delivered.length}/${delivered.length} rows delivered")))
    // state is durable at <dir>/.state (connector-dev.ts:63): the second
    // dev run resumes from the cursor and moves no rows
    assert(Files.exists(Paths.get(dir, ".state")))
    val (code2, out2) = cli("connector-dev", dir,
      "-m", s"$dir/dev-model.sql", "-c", s"$dir/dev-connection.yaml")
    assert(code2 == 0 && out2.exists(_.contains("0/0 rows delivered")))
    // a dir without package.json is refused loudly (connector-dev.ts:29-31)
    val bare = tmp()
    val (bad, badOut) = cli("connector-dev", bare,
      "-m", s"$dir/dev-model.sql", "-c", s"$dir/dev-connection.yaml")
    assert(bad == 1 && badOut.exists(_.contains("package.json")))
  }

  test("unknown command and unknown flag fail with usage, not a stack trace") {
    val (code, out) = cli("frobnicate")
    assert(code == 2 && out.exists(_.contains("Unknown command")))
    val (c2, out2) = cli("preview", "m", "--bogus", "x")
    assert(c2 == 1 && out2.exists(_.contains("unknown flag --bogus")))
  }

  /** A project over the sf0.001 parquet dir: one model (nation — 25
    * rows), one http-kind connection with an auth header, no syncs yet. */
  private def makeParquetProject(): String = {
    val dir = tmp()
    cli("init", dir)
    def write(rel: String, text: String): Unit =
      Files.write(Paths.get(dir, rel), text.getBytes("UTF-8"))
    write("models/nations.sql",
      s"""--{{ config "datasource" "parquet:$sfDir" }}
         |--{{ config "primaryKey" "n_nationkey" }}
         |SELECT n_nationkey, n_name, n_regionkey FROM nation
         |""".stripMargin)
    write("connections/hook.yml",
      """package:
        |  type: docker
        |  image: syncmaven/http:latest
        |credentials:
        |  url: "http://127.0.0.1:9/unreachable"
        |  headers:
        |    - "X-Api-Key: k1"
        |""".stripMargin)
    dir
  }
}
