package graft.sync

import graft.SparkSuite
import graft.model.Model
import graft.state.StateStore
import graft.operators.Diff
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer

/** B14 — full sync pipeline: cursor checkpointing across runs, validation
  * gating, and the CDC (snapshot-diff) mode. */
class SyncRunnerSpec extends SparkSuite {
  import spark.implicits._

  private def ordersModel(valid: Boolean = true) = Model(
    name = "orders",
    build = s => s.read.parquet(s"$sfDir/orders.parquet"),
    keyCols = Seq("o_orderkey"),
    cursorCol = Some("o_orderdate"),
    validations =
      if (valid) Nil
      else Seq("price_positive" -> (_ => col("o_totalprice") < 0))) // everything invalid

  test("incremental sync: second run sees only rows past the checkpoint") {
    val store = StateStore.inMemory()
    val runner = new SyncRunner(store)
    val seen = ArrayBuffer.empty[Long]
    def sink(df: DataFrame): Unit = seen += df.count()

    val r1 = runner.run(spark, ordersModel(), "s1", sink)
    assert(r1.rowsIn > 0 && !r1.incremental)
    assert(store.get(Seq("syncId=s1", "$lastCursor")).isDefined)

    val r2 = runner.run(spark, ordersModel(), "s1", sink)
    assert(r2.incremental)
    assert(r2.rowsIn == 0, "no new rows past max cursor")
    assert(seen.head > 0 && seen(1) == 0)
    // checkpoint survives an empty increment
    assert(store.get(Seq("syncId=s1", "$lastCursor")) == r1.newCursor.map(identity))
  }

  test("validation failures trip the error threshold before the sink runs") {
    val runner = new SyncRunner(StateStore.inMemory())
    var sinkRan = false
    val e = intercept[IllegalStateException] {
      runner.run(spark, ordersModel(valid = false), "s2", _ => sinkRan = true)
    }
    assert(e.getMessage.contains("error threshold"))
    assert(!sinkRan, "sink must not receive rows from an aborted sync")
  }

  test("runDiff emits insert-all on first run, then only changes") {
    val store = StateStore.inMemory()
    val runner = new SyncRunner(store)
    val root = Files.createTempDirectory("graft-snap").toString
    var last: DataFrame = null

    val m1 = Model("docs", s => Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v"),
      keyCols = Seq("id"))
    runner.runDiff(spark, m1, "d1", root, df => last = df.cache())
    assert(last.select(Diff.ChangeCol).as[String].collect().toSet == Set("insert"))
    assert(last.count() == 2)

    // run 2: 1 unchanged, 2 updated, 3 inserted, and... nothing deleted
    val m2 = Model("docs", s => Seq((1L, "a", 10.0), (2L, "b", 99.0), (3L, "c", 30.0)).toDF("id", "name", "v"),
      keyCols = Seq("id"))
    runner.runDiff(spark, m2, "d1", root, df => last = df.cache())
    val changes = last.select(col("id"), col(Diff.ChangeCol)).as[(Long, String)].collect().toMap
    assert(changes == Map(2L -> "update", 3L -> "insert"))

    // run 3: delete id=3
    runner.runDiff(spark, m1, "d1", root, df => last = df.cache())
    val changes3 = last.select(col("id"), col(Diff.ChangeCol)).as[(Long, String)].collect().toMap
    assert(changes3 == Map(2L -> "update", 3L -> "delete"))
  }

  test("snapshot diff distinguishes null from empty payloads") {
    val curr = Seq((1L, Option.empty[String]), (2L, Some(""))).toDF("id", "s")
    val prev = Seq((1L, Some("")), (2L, Some(""))).toDF("id", "s")
    val d = Diff.snapshotDiff(curr, prev, Seq("id"))
    assert(d.select("id", Diff.ChangeCol).as[(Long, String)].collect().toMap == Map(1L -> "update"))
  }
}
