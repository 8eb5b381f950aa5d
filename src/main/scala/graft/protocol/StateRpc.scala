package graft.protocol

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.state.StateStore

/**
 * The connector state side-channel: a small HTTP server the engine
 * starts next to each connector process and advertises via the `RPC_URL`
 * environment variable — graft's counterpart of the reference's one-time
 * express server (core/src/docker/docker-channel.ts:170-256; studied,
 * not ported). Connectors use it for durable per-sync state (cursors,
 * dedupe ledgers) through the `StreamPersistenceStore` verbs
 * (protocol/src/index.ts:11-29):
 *
 *   POST /state.get            {key}         → stored value or {}
 *   POST /state.set            {key, value}  → {}
 *   POST /state.del            {key}         → {}
 *   POST /state.deleteByPrefix {prefix}      → {}
 *   POST /state.size           {prefix}      → {size: n}
 *   POST /state.list           {prefix}      → ndjson of {key, value}
 *
 * Keys are a string or string array (protocol/src/index.ts:4); values are
 * arbitrary JSON, persisted as their compact text in the backing
 * [[StateStore]].
 *
 * Scale note: the server binds an ephemeral localhost port INSIDE the
 * executor task that owns the connector process — connector state calls
 * never cross the network. Durability across tasks comes from the
 * injected store (e.g. [[StateStore.onFile]] on shared storage); the RPC
 * layer itself is stateless.
 *
 * Container lanes ([[graft.sinks.ContainerRuntime]]) set `bindAll` so the
 * in-container connector can reach the server through the host gateway,
 * and `advertiseHost` names the gateway alias the advertised `RPC_URL`
 * carries (`host.docker.internal`, docker-channel.ts:52-54); command
 * lanes keep the loopback default. A non-loopback bind is guarded by a
 * per-lane `token` baked into the advertised URL's path — connectors
 * append verbs to RPC_URL, so the capability rides along transparently
 * and requests without it are rejected (the reference binds its express
 * server unauthenticated; the token closes that exposure).
 */
final class StateRpc(store: StateStore, bindAll: Boolean = false,
                     advertiseHost: String = "127.0.0.1",
                     token: Option[String] = None) {

  private val server: HttpServer = HttpServer.create(
    new InetSocketAddress(if (bindAll) "0.0.0.0" else "127.0.0.1", 0), 0)

  val port: Int = { start(); server.getAddress.getPort }
  def url: String =
    s"http://$advertiseHost:$port" + token.fold("")(t => s"/$t")

  private def start(): Unit = {
    server.createContext("/", (exchange: HttpExchange) => handle(exchange))
    server.setExecutor(null) // single dispatch thread: connector calls are sequential
    server.start()
  }

  def close(): Unit = server.stop(0)

  private def keyOf(j: JValue): Seq[String] = j match {
    case JString(s) => Seq(s)
    case JArray(vs) => vs.collect { case JString(s) => s }
    case _ => Seq.empty
  }

  private def compact(j: JValue): String = JsonMethods.compact(JsonMethods.render(j))

  private def handle(exchange: HttpExchange): Unit = {
    val out = exchange.getResponseBody
    try {
      val rawPath = exchange.getRequestURI.getPath
      val path = token match {
        case Some(t) if rawPath.startsWith(s"/$t/") => rawPath.substring(t.length + 1)
        case Some(_) =>
          // missing/wrong capability: reject before touching the store
          exchange.sendResponseHeaders(403, -1)
          return
        case None => rawPath
      }
      val body =
        try JsonMethods.parse(new String(
          exchange.getRequestBody.readAllBytes(), StandardCharsets.UTF_8))
        catch { case _: Exception => JObject() }
      path match {
        case "/state.get" =>
          // miss replies {} rather than erroring (docker-channel.ts:185-187)
          val v = store.get(keyOf(body \ "key")).getOrElse("{}")
          reply(exchange, out, "application/json", v)
        case "/state.set" =>
          store.set(keyOf(body \ "key"), compact(body \ "value"))
          reply(exchange, out, "application/json", "{}")
        case "/state.del" =>
          store.del(keyOf(body \ "key"))
          reply(exchange, out, "application/json", "{}")
        case "/state.deleteByPrefix" =>
          store.deleteByPrefix(keyOf(body \ "prefix"))
          reply(exchange, out, "application/json", "{}")
        case "/state.size" =>
          reply(exchange, out, "application/json",
            s"""{"size":${store.size(keyOf(body \ "prefix"))}}""")
        case "/state.list" =>
          // ndjson stream, one {key, value} entry per line
          // (docker-channel.ts:200-207)
          val sb = new StringBuilder
          store.stream(keyOf(body \ "prefix")).foreach { case (k, v) =>
            sb.append(compact(JObject(
              "key" -> JArray(k.map(JString(_)).toList),
              "value" -> (try JsonMethods.parse(v) catch { case _: Exception => JString(v) }))))
            sb.append('\n')
          }
          reply(exchange, out, "application/x-ndjson", sb.toString)
        case other =>
          reply(exchange, out, "application/json", "{}") // unknown verb: {} (docker-channel.ts:209)
      }
    } catch {
      case e: Exception =>
        val msg = compact(JObject("error" -> JString(String.valueOf(e.getMessage))))
        exchange.getResponseHeaders.set("Content-Type", "application/json")
        val bytes = msg.getBytes(StandardCharsets.UTF_8)
        exchange.sendResponseHeaders(500, bytes.length.toLong)
        out.write(bytes)
    } finally {
      out.close()
      exchange.close()
    }
  }

  private def reply(exchange: HttpExchange, out: OutputStream,
                    contentType: String, body: String): Unit = {
    exchange.getResponseHeaders.set("Content-Type", contentType)
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    exchange.sendResponseHeaders(200, bytes.length.toLong)
    out.write(bytes)
  }
}
