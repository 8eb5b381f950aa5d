package graft.protocol

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}
import scala.collection.mutable.ListBuffer

import Messages._

/**
 * Command-connector channel: spawns an external connector process and
 * drives the stdio protocol — graft's counterpart of the reference's
 * `CommandContainer` + `StdInOutChannel`
 * (core/src/docker/container.ts:71-164, core/src/docker/docker-channel.ts:35-168;
 * studied, not ported). The reference's other container flavor wraps the
 * same byte streams in a Docker attach; the protocol is identical, so a
 * connector developed against this channel runs unchanged under either
 * process manager.
 *
 * Lifecycle per the reference flow:
 *  - [[describe]] / [[streams]]: start process → send request → await the
 *    matching reply (`spec` / `stream-spec`) → stop process (each is a
 *    fresh one-shot run, docker-channel.ts:65-119).
 *  - [[startStream]] → [[row]]×N → [[stopStream]]: one long-lived process;
 *    `end-stream` asks it to flush and reply `stream-result`
 *    (docker-channel.ts:121-162).
 *  - `halt` from the connector fails the pending exchange; `log` lines
 *    (including any non-JSON stdout, which the tolerant parser wraps) are
 *    forwarded to `onLog`.
 *
 * Scale note: one channel = one OS process = one partition's delivery
 * lane. The engine runs a channel inside each executor task
 * ([[graft.sinks.ProcessSink]]), so connector throughput scales with the
 * cluster exactly like the reference's one-container-per-sync model
 * scales with syncs. The channel itself holds no row buffers — rows are
 * written through as they arrive from the partition iterator.
 */
final class StdioConnector(
    command: Seq[String],
    cwd: Option[String] = None,
    env: Map[String, String] = Map.empty,
    onLog: Log => Unit = _ => (),
    replyTimeoutMs: Long = 60000) {

  private var proc: Process = _
  private var stdin: BufferedWriter = _
  private var reader: Thread = _
  // replies that terminate a pending exchange (spec/stream-spec/
  // stream-result/enrichment-response/halt); logs are routed out-of-band
  private val replies = new LinkedBlockingQueue[Reply]()
  private val stderrTail = new ListBuffer[String]()

  def isRunning: Boolean = proc != null && proc.isAlive

  /** Spawn the process and start pumping its stdout through the tolerant
    * line parser (container.ts:112-136). */
  def start(): Unit = if (!isRunning) {
    val pb = new ProcessBuilder(command: _*)
    cwd.foreach(d => pb.directory(new java.io.File(d)))
    val e = pb.environment()
    env.foreach { case (k, v) => e.put(k, v) }
    proc = pb.start()
    stdin = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    replies.clear()
    reader = new Thread(() => {
      val out = new BufferedReader(
        new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
      var line = out.readLine()
      while (line != null) {
        Messages.parseLine(line) match {
          case Some(l: Log) => onLog(l)
          case Some(r) => replies.put(r)
          case None => () // unknown message: ignored, as in container.ts:30-40
        }
        line = out.readLine()
      }
    }, s"stdio-connector-out")
    reader.setDaemon(true)
    reader.start()
    val errPump = new Thread(() => {
      val err = new BufferedReader(
        new InputStreamReader(proc.getErrorStream, StandardCharsets.UTF_8))
      var line = err.readLine()
      while (line != null) {
        stderrTail.synchronized {
          stderrTail += line
          if (stderrTail.size > 50) stderrTail.remove(0)
        }
        onLog(Log("error", line))
        line = err.readLine()
      }
    }, "stdio-connector-err")
    errPump.setDaemon(true)
    errPump.start()
  }

  /** Write one protocol line (container.ts:139-152). */
  def send(m: Incoming): Unit = {
    require(isRunning, "connector process is not running")
    stdin.write(Messages.encode(m))
    stdin.write("\n")
    stdin.flush()
  }

  private def await[T](label: String)(pf: PartialFunction[Reply, T]): T = {
    val deadline = System.nanoTime() + replyTimeoutMs * 1000000L
    while (true) {
      val left = deadline - System.nanoTime()
      if (left <= 0)
        throw new IllegalStateException(
          s"connector did not reply to $label within ${replyTimeoutMs}ms$errContext")
      val r = replies.poll(left, TimeUnit.NANOSECONDS)
      r match {
        case null => () // loop re-checks deadline
        case Halt(status, msg) if status != "ok" =>
          throw new IllegalStateException(
            s"connector halted during $label: ${msg.getOrElse("no message")}$errContext")
        case m if pf.isDefinedAt(m) => return pf(m)
        case _ => () // stale reply from a previous exchange: drop
      }
    }
    sys.error("unreachable")
  }

  private def errContext: String = {
    val tail = stderrTail.synchronized(stderrTail.toList)
    if (tail.isEmpty) "" else tail.mkString("; stderr: ", " | ", "")
  }

  /** One-shot `describe` → `spec` (docker-channel.ts:65-91). */
  def describe(): ConnectionSpec = oneShot("describe") {
    send(Describe)
    await("describe") { case s: ConnectionSpec => s }
  }

  /** One-shot `describe-streams` → `stream-spec` (docker-channel.ts:93-119). */
  def streams(msg: DescribeStreams): StreamSpec = oneShot("describe-streams") {
    send(msg)
    await("describe-streams") { case s: StreamSpec => s }
  }

  private def oneShot[T](label: String)(body: => T): T = {
    start()
    try body finally stop()
  }

  /** Open the long-lived stream phase (docker-channel.ts:121-127). */
  def startStream(msg: StartStream): Unit = { start(); send(msg) }

  /** Stream one row; rows are not individually acknowledged — delivery
    * status arrives aggregated in the final `stream-result`. */
  def row(rowJson: String): Unit = send(RowMsg(rowJson))

  /** Close the stream: `end-stream` → await `stream-result`, then stop the
    * process (docker-channel.ts:133-158). */
  def stopStream(reason: String = "success"): StreamResult =
    try {
      send(EndStream(reason))
      await("end-stream") { case r: StreamResult => r }
    } finally stop()

  /** Enrichment session: `enrichment-connect` once, then
    * [[enrich]] per row (protocol/src/index.ts:183-218). */
  def startEnrichment(msg: EnrichmentConnect): Unit = { start(); send(msg) }

  def enrich(rowJson: String): EnrichmentResponse = {
    send(EnrichmentRequest(rowJson))
    await("enrichment-request") { case r: EnrichmentResponse => r }
  }

  /** Forcefully stop the process (container.ts:154-159). */
  def stop(): Unit = if (proc != null) {
    try { if (stdin != null) stdin.close() } catch { case _: Exception => () }
    proc.destroy()
    if (!proc.waitFor(5, TimeUnit.SECONDS)) proc.destroyForcibly()
  }
}
