package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.functions._

class PayloadsSpec extends SparkSuite {
  import spark.implicits._

  test("audience batches: 1000-cap, schema header, sha256-lower members") {
    val df = (1 to 2500).map(i => s"User$i@Example.COM").toDF("email")
    val got = Payloads.audienceBatches(df, "email")
    val sizes = got.select("n_members").as[Long].collect().sorted.toSeq
    assert(sizes.sum == 2500 && sizes.max <= 1000 && sizes.length == 3)
    val payload = got.orderBy("batch_id").select("payload_json").as[String].head()
    assert(payload.contains("\"schema\":[\"EMAIL_SHA256\"]"))
    assert(!payload.toLowerCase.contains("example.com"), "raw emails must never appear")
    assert("\\b[0-9a-f]{64}\\b".r.findFirstIn(payload).isDefined, "members are sha256 hex")
  }

  test("http ndjson and array bodies") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val nd = Payloads.httpBodies(df, "ndjson", batchSize = 2, orderCol = "id")
      .orderBy("batch_id").select("body").as[String].collect()
    assert(nd.length == 2)
    assert(nd(0).split("\n").length == 2 && nd(1).split("\n").length == 1)
    assert(nd(0).startsWith("{\"id\":1"))

    val arr = Payloads.httpBodies(df, "array", batchSize = 10, orderCol = "id")
      .select("body").as[String].head()
    assert(arr.startsWith("[{") && arr.endsWith("}]"))
    assert(arr.split("\\},\\{").length == 3)
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
}
