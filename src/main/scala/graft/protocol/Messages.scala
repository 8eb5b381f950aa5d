package graft.protocol

import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * The connector-protocol message vocabulary — graft's implementation of
 * the reference's process-boundary protocol (protocol/src/index.ts:34-243;
 * studied, not ported). Connectors are separate processes exchanging
 * newline-delimited JSON over stdio: the engine sends INCOMING messages
 * (`describe`, `describe-streams`, `start-stream`, `row`, `end-stream`,
 * `enrichment-connect`, `enrichment-request`), the connector sends
 * REPLIES (`spec`, `stream-spec`, `stream-result`, `enrichment-response`)
 * plus out-of-band system messages (`log`, `halt`;
 * protocol/src/index.ts:275).
 *
 * Free-form payload fields the reference types as `z.any()` (credentials,
 * options, row bodies) stay [[JValue]] here — the engine routes them,
 * connectors interpret them.
 *
 * Scale note: message values ship inside executor tasks (one connector
 * process per partition), so everything here is Serializable and carries
 * no process state.
 */
object Messages {

  sealed trait Message extends Serializable { def typ: String }

  /** Engine → connector. */
  sealed trait Incoming extends Message
  /** Connector → engine. */
  sealed trait Reply extends Message

  case object Describe extends Incoming { val typ = "describe" }
  final case class DescribeStreams(credentials: JValue) extends Incoming {
    val typ = "describe-streams"
  }
  final case class StartStream(
      stream: String,
      connectionCredentials: JValue = JObject(),
      streamOptions: JValue = JObject(),
      syncId: String = "",
      fullRefresh: Boolean = false) extends Incoming {
    val typ = "start-stream"
  }
  /** One data row; `row` is the raw JSON object text (rows come straight
    * from `Dataset.toJSON`, so the engine never re-parses them). */
  final case class RowMsg(rowJson: String) extends Incoming { val typ = "row" }
  final case class EndStream(reason: String = "success") extends Incoming {
    val typ = "end-stream"
  }
  final case class EnrichmentConnect(credentials: JValue, options: JValue)
      extends Incoming { val typ = "enrichment-connect" }
  final case class EnrichmentRequest(rowJson: String) extends Incoming {
    val typ = "enrichment-request"
  }

  final case class ConnectionSpec(roles: Seq[String], connectionCredentials: JValue)
      extends Reply { val typ = "spec" }
  final case class StreamDef(name: String, rowType: JValue, streamOptions: JValue)
  final case class StreamSpec(defaultStream: String, streams: Seq[StreamDef])
      extends Reply { val typ = "stream-spec" }
  /** Per-stream delivery counters (protocol/src/index.ts:138-143). */
  final case class Status(received: Long, success: Long, skipped: Long, failed: Long) {
    def +(o: Status): Status =
      Status(received + o.received, success + o.success, skipped + o.skipped, failed + o.failed)
  }
  object Status { val zero: Status = Status(0, 0, 0, 0) }
  final case class StreamResult(status: Status) extends Reply { val typ = "stream-result" }
  final case class Log(level: String, message: String) extends Reply { val typ = "log" }
  final case class Halt(status: String, message: Option[String]) extends Reply {
    val typ = "halt"
  }
  final case class EnrichmentResponse(row: JValue) extends Reply {
    val typ = "enrichment-response"
  }

  // ---- encoding (engine → connector) --------------------------------

  private def compact(j: JValue): String = JsonMethods.compact(JsonMethods.render(j))

  /** One protocol line (no trailing newline). */
  def encode(m: Incoming): String = m match {
    case Describe => """{"type":"describe"}"""
    case DescribeStreams(cred) =>
      compact(JObject("type" -> JString("describe-streams"),
        "payload" -> JObject("credentials" -> cred)))
    case s: StartStream =>
      compact(JObject("type" -> JString("start-stream"), "payload" -> JObject(
        "stream" -> JString(s.stream),
        "connectionCredentials" -> s.connectionCredentials,
        "streamOptions" -> s.streamOptions,
        "syncId" -> JString(s.syncId),
        "fullRefresh" -> JBool(s.fullRefresh))))
    case RowMsg(rowJson) =>
      // row bodies are already JSON — splice, don't re-encode
      s"""{"type":"row","payload":{"row":$rowJson}}"""
    case EndStream(reason) =>
      s"""{"type":"end-stream","reason":"$reason"}"""
    case EnrichmentConnect(cred, opts) =>
      compact(JObject("type" -> JString("enrichment-connect"),
        "payload" -> JObject("credentials" -> cred, "options" -> opts)))
    case EnrichmentRequest(rowJson) =>
      s"""{"type":"enrichment-request","payload":{"row":$rowJson}}"""
  }

  // ---- decoding (connector → engine) --------------------------------

  /** Tolerant line intake, mirroring the reference's channel
    * (core/src/docker/container.ts:46-58): a line with no `{` at all is a
    * plain-text log; leading garbage before the first `{` (timestamps,
    * log prefixes) is stripped; a line that still fails to parse as JSON
    * falls back to a log message. A line that parses as JSON but not as a
    * known reply is IGNORED (container.ts:30-40 — malformed messages must
    * not kill a running stream), signalled by None. */
  def parseLine(line: String): Option[Reply] = {
    val data = line.trim
    if (data.isEmpty) return None
    val iof = data.indexOf('{')
    if (iof < 0) return Some(Log("info", data))
    val json =
      try JsonMethods.parse(data.substring(iof))
      catch { case _: Exception => return Some(Log("info", data)) }
    decode(json)
  }

  private def str(j: JValue): Option[String] =
    j match { case JString(s) => Some(s); case _ => None }
  private def long(j: JValue): Long = j match {
    case JInt(n) => n.toLong
    case JLong(n) => n
    case JDouble(d) => d.toLong
    case JDecimal(d) => d.toLong
    case _ => 0L
  }

  private def decode(json: JValue): Option[Reply] = str(json \ "type") match {
    case Some("spec") =>
      val roles = json \ "payload" \ "roles" match {
        case JArray(vs) => vs.flatMap(str)
        case _ => Nil
      }
      Some(ConnectionSpec(roles, json \ "payload" \ "connectionCredentials"))
    case Some("stream-spec") =>
      val streams = json \ "payload" \ "streams" match {
        case JArray(vs) => vs.flatMap { v =>
          str(v \ "name").map(n => StreamDef(n, v \ "rowType", v \ "streamOptions"))
        }
        case _ => Nil
      }
      str(json \ "payload" \ "defaultStream")
        .orElse(streams.headOption.map(_.name))
        .map(d => StreamSpec(d, streams))
    case Some("stream-result") =>
      // payload is either one StatusObject or a per-stream record of them
      // (protocol/src/index.ts:145-151); the record form sums.
      def status(p: JValue): Option[Status] = p match {
        case o: JObject if o.obj.exists(_._1 == "received") =>
          Some(Status(long(o \ "received"), long(o \ "success"),
            long(o \ "skipped"), long(o \ "failed")))
        case _ => None
      }
      val p = json \ "payload"
      val s = status(p).orElse(p match {
        case JObject(fields) =>
          val per = fields.flatMap { case (_, v) => status(v) }
          if (per.nonEmpty) Some(per.reduce(_ + _)) else None
        case _ => None
      })
      Some(StreamResult(s.getOrElse(Status.zero)))
    case Some("log") =>
      Some(Log(str(json \ "payload" \ "level").getOrElse("info"),
        str(json \ "payload" \ "message").getOrElse("")))
    case Some("halt") =>
      Some(Halt(str(json \ "payload" \ "status").getOrElse("error"),
        str(json \ "payload" \ "message")))
    case Some("enrichment-response") =>
      Some(EnrichmentResponse(json \ "payload" \ "row"))
    case None =>
      // `halt` is the one reply whose `type` tag is OPTIONAL
      // (protocol/src/index.ts:171) — recognize it by its payload shape
      str(json \ "payload" \ "status") match {
        case Some(s @ ("ok" | "error")) =>
          Some(Halt(s, str(json \ "payload" \ "message")))
        case _ => None
      }
    case _ => None // unknown or engine-direction type: ignore
  }
}
