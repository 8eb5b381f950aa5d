package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSuite {
  import spark.implicits._

  private val eff = lit("2024-06-01").cast("timestamp")

  private def history = Seq(
    // key 1: open, will be unchanged
    (1L, "alice", 10.0, "2023-01-01", null.asInstanceOf[String], true),
    // key 2: open, payload will change
    (2L, "bob", 20.0, "2023-01-01", null.asInstanceOf[String], true),
    // key 2 also has an already-closed older version — must pass through
    (2L, "bobby", 15.0, "2022-01-01", "2023-01-01", false),
    // key 3: open, will vanish (soft delete)
    (3L, "carol", 30.0, "2023-01-01", null.asInstanceOf[String], true)
  ).toDF("id", "name", "balance", "vf", "vt", "is_current")
    .select(col("id"), col("name"), col("balance"),
      col("vf").cast("timestamp").as("valid_from"),
      col("vt").cast("timestamp").as("valid_to"), col("is_current"))

  private def current = Seq(
    (1L, "alice", 10.0),  // unchanged
    (2L, "bob", 25.0),    // balance changed
    (4L, "dave", 40.0)    // new key
  ).toDF("id", "name", "balance")

  test("all five SCD2 paths: pass-through, unchanged, update, delete, insert") {
    val out = Scd.applyScd2(history, current, Seq("id"), eff)
      .orderBy("id", "valid_from").collect()

    val rows = out.map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      Option(r.get(3)).map(_.toString.take(10)).orNull,
      Option(r.get(4)).map(_.toString.take(10)).orNull, r.getBoolean(5)))

    assert(rows.toSeq == Seq(
      (1L, "alice", 10.0, "2023-01-01", null, true),               // unchanged
      (2L, "bobby", 15.0, "2022-01-01", "2023-01-01", false),      // closed pass-through
      (2L, "bob", 20.0, "2023-01-01", "2024-06-01", false),        // update: closed
      (2L, "bob", 25.0, "2024-06-01", null, true),                 // update: new open
      (3L, "carol", 30.0, "2023-01-01", "2024-06-01", false),      // soft delete
      (4L, "dave", 40.0, "2024-06-01", null, true)                 // insert
    ))
  }

  test("a key-only snapshot is rejected with a clear message") {
    val e = intercept[IllegalArgumentException] {
      Scd.applyScd2(history, current.select("id"), Seq("id"), eff)
    }
    assert(e.getMessage.contains("non-key column"))
    val e2 = intercept[IllegalArgumentException] {
      val keysOnly = Seq(1L).toDF("id")
      Diff.threeWayMerge(keysOnly, keysOnly, keysOnly, Seq("id"))
    }
    assert(e2.getMessage.contains("non-key column"))
  }

  test("idempotence: re-applying the same snapshot changes nothing") {
    val once = Scd.applyScd2(history, current, Seq("id"), eff)
    val twice = Scd.applyScd2(once, current, Seq("id"), eff)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("exactly one open version per surviving key") {
    val out = Scd.applyScd2(history, current, Seq("id"), eff)
    val opens = out.filter(col("is_current")).groupBy("id").count().collect()
    assert(opens.forall(_.getLong(1) == 1L))
    assert(opens.map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("B44 asOf: at most one version per key at any probe; windows are half-open") {
    val out = Scd.applyScd2(history, current, Seq("id"), eff)
    Seq("1996-06-01", "1997-07-01", "1999-01-01").foreach { p =>
      val snap = Scd.asOf(out, lit(p).cast("timestamp"))
      val perKey = snap.groupBy("id").count().collect()
      assert(perKey.forall(_.getLong(1) == 1L), s"probe $p: ${perKey.toSeq}")
    }
    // a probe before every valid_from sees nothing
    assert(Scd.asOf(out, lit("1900-01-01").cast("timestamp")).count() == 0)
    // half-open: AT the apply instant the NEW generation is visible, the
    // closed one is not — valid_to is exclusive, valid_from inclusive
    val atEff = Scd.asOf(out, eff)
    assert(atEff.filter(!col("is_current") && col("valid_to") === eff).count() == 0)
  }
}
