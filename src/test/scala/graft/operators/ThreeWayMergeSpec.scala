package graft.operators

import graft.SparkSuite

class ThreeWayMergeSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("id", "v")

  test("every merge branch resolves as documented") {
    val base = df(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d", 5L -> "e",
      6L -> "f", 7L -> "g", 11L -> "k")
    val ours = df(1L -> "a", 2L -> "B", 3L -> "c", 4L -> "D", 5L -> "E1",
      /* 6,7 deleted */ 8L -> "h", 9L -> "i", 10L -> "J1", 11L -> "k")
    val theirs = df(1L -> "a", 2L -> "b", 3L -> "C", 4L -> "D", 5L -> "E2",
      6L -> "f", 7L -> "G", 9L -> "i", 10L -> "J2" /* 11 deleted */)

    val out = Diff.threeWayMerge(base, ours, theirs, Seq("id"))
      .orderBy("id")
      .select("id", "merged_v", "action", "resolution", "conflict")
      .as[(Long, String, String, String, Boolean)].collect().toSeq

    assert(out == Seq(
      (1L, "a", "keep", "none", false),       // untouched
      (2L, "B", "update", "ours", false),     // ours-only edit
      (3L, "C", "update", "theirs", false),   // theirs-only edit
      (4L, "D", "update", "both", false),     // identical double edit
      (5L, "E1", "update", "ours", true),     // conflicting edit: warehouse wins
      (6L, null, "delete", "ours", false),    // our delete, theirs untouched
      (7L, "G", "update", "theirs", true),    // our delete vs their edit: edit wins
      (8L, "h", "update", "ours", false),     // our insert
      (9L, "i", "update", "both", false),     // same insert on both sides
      (10L, "J1", "update", "ours", true),    // diverging double insert
      (11L, null, "delete", "theirs", false)  // their delete, ours untouched
    ))
  }

  test("merging identical snapshots is a no-op: all keep/none") {
    val s = df(1L -> "a", 2L -> "b")
    val out = Diff.threeWayMerge(s, s, s, Seq("id"))
      .select("action", "resolution").as[(String, String)].collect()
    assert(out.forall(_ == (("keep", "none"))))
  }
}
