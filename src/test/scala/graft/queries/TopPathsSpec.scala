package graft.queries

import graft.SparkSuite
import java.nio.file.Files

/** D20: 3-step path mining on a planted event log. */
class TopPathsSpec extends SparkSuite {
  import spark.implicits._

  test("q124: paths respect per-user event-time order and count with multiplicity") {
    // user 1: v->c->p->v  => paths (v,c,p), (c,p,v)
    // user 2: v->c->p     => (v,c,p)
    // user 3: p->v        => too short, no path
    val rows = Seq(
      (1L, 10L, 1L, "view", 0.0), (2L, 20L, 1L, "click", 0.0),
      (3L, 30L, 1L, "purchase", 0.0), (4L, 40L, 1L, "view", 0.0),
      (5L, 10L, 2L, "view", 0.0), (6L, 20L, 2L, "click", 0.0),
      (7L, 30L, 2L, "purchase", 0.0),
      (8L, 10L, 3L, "purchase", 0.0), (9L, 20L, 3L, "view", 0.0))
    val dir = Files.createTempDirectory("graft-paths").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")

    val out = Events.q124TopPaths(Tables(spark, dir))
      .as[(String, String, String, Long)].collect().toSeq
    assert(out == Seq(
      ("view", "click", "purchase", 2L),
      ("click", "purchase", "view", 1L)))
  }
}
