package graft.model

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSuite {
  import spark.implicits._
  import Expectations._

  private def fact = Seq(
    (1L, Some(10L), "O", "2024-01-05"),
    (2L, Some(10L), "O", "2024-01-06"),   // duplicate custkey 10
    (3L, Some(99L), "X", "2024-01-07"),   // bad status, unresolvable FK
    (4L, None, "F", "2024-01-08")         // null custkey
  ).toDF("id", "custkey", "status", "d")
    .withColumn("d", col("d").cast("timestamp"))

  private def dim = Seq(10L, 11L).toDF("c_id")

  test("each expectation counts its own failures; report is name-ordered") {
    val out = report(fact,
      local = Seq(Unique(Seq("id")), Unique(Seq("custkey")),
        NotNull("custkey"), AcceptedValues("status", Seq("O", "F")),
        Freshness("d", "2024-01-08")),
      fks = Seq(RefIntegrity("custkey", "dim.c_id", dim, "c_id")))
      .as[(String, Long, Boolean)].collect().toSeq

    assert(out == Seq(
      ("accepted:status", 1L, false),          // 'X'
      ("fk:custkey->dim.c_id", 1L, false),     // 99 unresolved; NULL is not an FK failure
      ("freshness:d", 0L, true),               // max(d) == threshold, not older
      ("not_null:custkey", 1L, false),
      ("unique:custkey", 2L, false),           // 4 rows - distinct{10,99}: dup + NULL row
      ("unique:id", 0L, true)))
  }

  test("stale table fails freshness") {
    val out = report(fact, local = Seq(Freshness("d", "2024-02-01")))
      .as[(String, Long, Boolean)].head()
    assert(out == (("freshness:d", 1L, false)))
  }

  test("an EMPTY table fails freshness (NULL max is stale, not a pass)") {
    val out = report(fact.limit(0), local = Seq(Freshness("d", "2024-01-01")))
      .as[(String, Long, Boolean)].head()
    assert(out == (("freshness:d", 1L, false)))
  }

  test("duplicate expectation names are rejected") {
    intercept[IllegalArgumentException] {
      report(fact, local = Seq(Freshness("d", "2024-01-01"), Freshness("d", "2024-02-01")))
    }
  }
}
