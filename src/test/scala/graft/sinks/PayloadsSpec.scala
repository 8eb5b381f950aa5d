package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PayloadsSpec extends SparkSuite {
  import spark.implicits._

  test("audience batches: size cap, coverage, schema header, sha256-lower members") {
    val df = (1 to 2500).map(i => s"User$i@Example.COM").toDF("email")
    val got = Payloads.audienceBatches(df, "email")
    val sizes = got.select("n_members").as[Long].collect().sorted.toSeq
    assert(sizes.sum == 2500, "every member lands in exactly one batch")
    assert(sizes.max <= 1000, "batch cap respected")
    assert(sizes.length >= 3, "at least ceil(n/batchSize) batches")
    val payload = got.orderBy("batch_key").select("payload_json").as[String].head()
    assert(payload.contains("\"schema\":[\"EMAIL_SHA256\"]"))
    assert(!payload.toLowerCase.contains("example.com"), "raw emails must never appear")
    assert("\\b[0-9a-f]{64}\\b".r.findFirstIn(payload).isDefined, "members are sha256 hex")
  }

  test("audience batches are deterministic across runs (salted, not random)") {
    val df = (1 to 300).map(i => s"u$i@x.co").toDF("email")
    val a = Payloads.audienceBatches(df, "email").orderBy("batch_key")
      .select("batch_key", "payload_json").as[(String, String)].collect().toSeq
    val b = Payloads.audienceBatches(df, "email").orderBy("batch_key")
      .select("batch_key", "payload_json").as[(String, String)].collect().toSeq
    assert(a == b)
  }

  test("http ndjson and array bodies: cap, coverage, in-body ordering") {
    val df = (1L to 20L).map(i => (i, s"name$i")).toDF("id", "name")
    val nd = Payloads.httpBodies(df, "ndjson", batchSize = 2, orderCol = "id")
      .select("body").as[String].collect()
    val lines = nd.flatMap(_.split("\n"))
    assert(lines.length == 20, "every row serialized exactly once")
    assert(nd.forall(_.split("\n").length <= 2), "body cap respected")
    // rows inside one body stay ordered by orderCol
    val idsPerBody = nd.map(_.split("\n").toSeq.map(l => "\"id\":(\\d+)".r.findFirstMatchIn(l).get.group(1).toLong))
    assert(idsPerBody.forall(ids => ids == ids.sorted))

    val arr = Payloads.httpBodies(df, "array", batchSize = 100, orderCol = "id")
      .select("body").as[String].collect()
    assert(arr.forall(b => b.startsWith("[{") && b.endsWith("}]")))
    assert(arr.map(_.split("\\},\\{").length).sum == 20)
  }

  test("upsert objects carry a properties map keyed by column name") {
    val df = Seq((7L, "Ann", 12.5)).toDF("cid", "name", "score")
    val row = Payloads.upsertObjects(df, "cid", Seq("name", "score")).collect()(0)
    assert(row.getAs[String]("external_id") == "7")
    val json = row.getAs[String]("properties_json")
    assert(json.contains("\"name\":\"Ann\"") && json.contains("\"score\":\"12.5\""))
  }

  test("mixpanel profiles: $distinct_id + $set map per row") {
    val df = Seq((42L, "Bea", "de")).toDF("uid", "name", "country")
    val json = Payloads.mixpanelProfiles(df, "uid", Seq("name", "country"))
      .select("profile_json").as[String].head()
    assert(json.contains("\"$distinct_id\":\"42\""))
    assert(json.contains("\"$set\":{") && json.contains("\"country\":\"de\""))
  }

  test("sheet rows: header at idx 0, data 1..n in order, all stringified") {
    val df = Seq((2L, "b"), (1L, "a")).toDF("id", "name")
    val rows = Payloads.sheetRows(df, "id").orderBy("row_idx")
      .as[(Long, Seq[String])].collect()
    assert(rows(0) == ((0L, Seq("id", "name"))))
    assert(rows(1) == ((1L, Seq("1", "a"))))
    assert(rows(2) == ((2L, Seq("2", "b"))))
  }

  test("audience clear replays the previous snapshot as delete batches") {
    val prev = Seq("x@y.z", "a@b.c").toDF("email")
    val got = Payloads.audienceClearBatches(prev, "email").collect()
    assert(got.forall(_.getAs[String]("op") == "delete"))
    assert(got.map(_.getAs[Long]("n_members")).sum == 2)
  }
  test("httpTemplatedBodies: envelope macros splice rows, row, and length") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val tpl = """{"api_key": "{{ env.API_KEY }}", "events": "{{ result.rows }}", "count": "{{ result.length }}"}"""
    val out = Payloads.httpTemplatedBodies(df, tpl, batchSize = 2, orderCol = "id",
        env = Map("API_KEY" -> "k-123"))
      .select("body", "n_rows").as[(String, Long)].collect()
    assert(out.map(_._2).sum == 3, "every row lands in exactly one body")
    out.foreach { case (body, n) =>
      val parsed = spark.read.json(Seq(body).toDS)
      val row = parsed.select("api_key", "count").as[(String, String)].head()
      assert(row._1 == "k-123" && row._2.toLong == n, s"envelope fields wrong in $body")
      // events must be a real nested JSON array of the batch's rows
      val events = parsed.select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("events"))).count()
      assert(events == n, s"nested rows array must carry the batch in $body")
    }

    // result.row forces single-row bodies carrying the bare row object
    val single = Payloads.httpTemplatedBodies(df, """{"user": "{{ result.row }}"}""",
        batchSize = 99, orderCol = "id")
      .select("body", "n_rows").as[(String, Long)].collect()
    assert(single.length == 3 && single.forall(_._2 == 1L))
    val ids = single.map(b => spark.read.json(Seq(b._1).toDS).select("user.id").as[Long].head()).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

}
