package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** B49: the integrity audit must count orphans and null keys correctly
  * on a broken fixture, and report clean relations as zero. */
class IntegritySpec extends SparkSuite {
  import spark.implicits._

  test("B49: orphans, null keys, and the per-mille rate on a broken relation") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(98L), None)
      .toDF("fk")
    val got = ReverseEtl.integrityAudit("child.fk->parent", child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Long)].head()
    // 6 rows, 1 null, 2 orphans (99, 98), 2000/6 = 333 per-mille
    assert(got == (("child.fk->parent", 6L, 1L, 2L, 333L)))
  }

  test("B49: a clean relation reports zeros; duplicate parents don't inflate") {
    val parent = Seq(1L, 1L, 2L).toDF("pk") // dup pk must not multiply rows
    val child = Seq(1L, 2L, 2L, 2L).toDF("fk")
    val got = ReverseEtl.integrityAudit("r", child, "fk", parent, "pk")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("r", 4L, 0L, 0L, 0L)))
  }
}
