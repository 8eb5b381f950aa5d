package graft.sinks

import graft.SparkSuite
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Records batch sizes; optionally rate-limits or fails. Top-level static
  * state so executor-side calls (same JVM in local mode) are observable
  * and the transport closure stays serializable. */
object Recorder {
  val batches = new ConcurrentLinkedQueue[Int]()
  @volatile var rateLimitFirstN = 0
  @volatile var failAll = false
  def reset(): Unit = { batches.clear(); rateLimitFirstN = 0; failAll = false }
}

/** Captures full row maps (top-level for closure serializability). */
object RowCapture {
  val rows = new ConcurrentLinkedQueue[Map[String, Any]]()
}
class CapturingTransport extends RestSink.Transport {
  def send(batch: Seq[Map[String, Any]]): Unit = batch.foreach(RowCapture.rows.add)
}

class FakeTransport extends RestSink.Transport {
  def send(batch: Seq[Map[String, Any]]): Unit = {
    if (Recorder.failAll) throw new RuntimeException("boom")
    if (Recorder.rateLimitFirstN > 0) {
      Recorder.rateLimitFirstN -= 1
      throw RestSink.RateLimited(retryAfterMs = 5)
    }
    Recorder.batches.add(batch.size)
  }
}

/** B13 — batching, rate-limit retry, and the error-threshold abort, using a
  * recording fake transport (no egress in this environment). */
class RestSinkSpec extends SparkSuite {
  import spark.implicits._

  private def df(n: Int) = (1 to n).map(i => (i.toLong, s"row$i")).toDF("id", "name")

  test("batches respect batchSize and cover every row") {
    Recorder.reset()
    val r = RestSink.push(df(2500).repartition(2), new FakeTransport,
      RestSink.Config(batchSize = 1000))
    assert(r.sentRows == 2500 && r.failedRows == 0)
    val sizes = Recorder.batches.asScala.toSeq
    assert(sizes.sum == 2500)
    assert(sizes.forall(_ <= 1000))
  }

  test("rate-limited batches are retried and still delivered") {
    Recorder.reset()
    Recorder.rateLimitFirstN = 2
    val r = RestSink.push(df(100).repartition(1), new FakeTransport,
      RestSink.Config(batchSize = 50, maxRetries = 5))
    assert(r.sentRows == 100)
    assert(r.retries >= 2)
  }

  test("destination profiles drive the batcher (facebook 1000, mixpanel 2000)") {
    assert(RestSink.Profiles.forDestination("facebook-ads").batchSize == 1000)
    assert(RestSink.Profiles.forDestination("mixpanel").batchSize == 2000)
    assert(RestSink.Profiles.forDestination("nobody-knows-this").batchSize == 1000,
      "unknown destinations get the cdk default")
    Recorder.reset()
    val r = RestSink.push(df(2500).repartition(1), new FakeTransport,
      RestSink.Profiles.forDestination("mixpanel"))
    assert(r.sentRows == 2500 && r.batches == 2, "2000 + 500 under the mixpanel profile")
  }

  test("delivery plan: batches round up, the token bucket floors wall time") {
    val p = RestSink.plan(2500, RestSink.Profiles.forDestination("mixpanel"))
    assert(p == RestSink.Plan(2500, 2, 0.0)) // 2000 + 500, unlimited rate
    val r = RestSink.plan(100, RestSink.Profiles.forDestination("resend"))
    assert(r == RestSink.Plan(100, 100, 10.0)) // row-paced at 10 rows/s
    assert(RestSink.plan(0, RestSink.Config()) == RestSink.Plan(0, 0, 0.0))
  }

  test("rate divisor: explicit maxConcurrency beats the defaultParallelism snapshot") {
    // under dynamic allocation the submit-time parallelism snapshot can
    // undercount true task concurrency; an explicit cap keeps the
    // aggregate rate inside permitsPerSecond
    val static = RestSink.rateDivisor(spark, RestSink.Config())
    assert(static == math.max(1, spark.sparkContext.defaultParallelism))
    assert(RestSink.rateDivisor(spark, RestSink.Config(maxConcurrency = 96)) == 96)
    assert(RestSink.rateDivisor(spark, RestSink.Config(maxConcurrency = 0)) == static,
      "0 keeps the static-cluster default")
  }

  test("temporal and binary columns reach the wire as ISO-8601 / base64 strings") {
    // java.time values have no json4s serializer and the module system
    // blocks the reflective fallback — without normalization EVERY row
    // of a timestamp-bearing sync fails at the transport
    RowCapture.rows.clear()
    val ts = java.sql.Timestamp.valueOf("2021-06-01 12:30:00")
    val in = Seq((1L, ts,
        java.sql.Date.valueOf("2021-06-02"), Array[Byte](1, 2, 3)))
      .toDF("id", "ts", "d", "blob")
    val res = RestSink.push(in, new CapturingTransport)
    assert(res.sentRows == 1 && res.failedRows == 0, s"$res")
    val row = RowCapture.rows.asScala.head
    assert(row("id") == 1L)
    // expected built from the same Timestamp so the assert holds in any
    // host timezone (jsonSafe renders UTC instants)
    assert(row("ts") == ts.toInstant.toString, row("ts").toString)
    assert(row("d") == "2021-06-02")
    assert(row("blob") == java.util.Base64.getEncoder.encodeToString(Array[Byte](1, 2, 3)))
    // and the serialized JSON form the HTTP transport would emit is valid
    val json = org.json4s.jackson.Serialization.write(
      Seq(row))(org.json4s.DefaultFormats)
    assert(json.contains("\"2021-06-02\""))
  }

  test("persistent failure trips the 20%/100-row error threshold") {
    Recorder.reset()
    Recorder.failAll = true
    val e = intercept[IllegalStateException] {
      RestSink.push(df(200).repartition(1), new FakeTransport,
        RestSink.Config(batchSize = 50, maxRetries = 1))
    }
    assert(e.getMessage.contains("error threshold"))
  }
}
