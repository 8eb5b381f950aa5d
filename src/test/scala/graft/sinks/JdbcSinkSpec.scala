package graft.sinks

import graft.SparkSuite

import java.sql.DriverManager

/** JDBC sink against embedded Derby: parallel append round-trip, and MERGE
  * upsert updating overlapping keys while inserting new ones. */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private lazy val created: Unit = {
    val conn = DriverManager.getConnection(url)
    conn.createStatement().execute(
      "CREATE TABLE dest (id INT NOT NULL PRIMARY KEY, email VARCHAR(64), score DOUBLE)")
    conn.close()
  }

  private def state(): Map[Int, (String, Double)] = {
    val conn = DriverManager.getConnection(url)
    val rs = conn.createStatement().executeQuery("SELECT id, email, score FROM dest")
    val out = Iterator.continually(rs)
      .takeWhile(_.next())
      .map(r => r.getInt(1) -> (r.getString(2), r.getDouble(3)))
      .toMap
    conn.close()
    out
  }

  test("append writes all partitions in parallel") {
    created
    val df = (1 to 100).map(i => (i, s"u$i@x.y", i * 1.0)).toDF("id", "email", "score")
      .repartition(4)
    JdbcSink.append(df, url, "dest")
    val s = state()
    assert(s.size == 100 && s(7) == (("u7@x.y", 7.0)))
  }

  test("upsert updates overlapping keys and inserts new ones (batched MERGE)") {
    created
    val df = ((90 to 100).map(i => (i, s"new$i@x.y", i * 2.0)) ++
      (101 to 120).map(i => (i, s"u$i@x.y", i * 1.0))).toDF("id", "email", "score")
      .repartition(3)
    JdbcSink.upsert(df, url, "dest", keyCols = Seq("id"), batchSize = 7)
    val s = state()
    assert(s.size == 120, "20 inserts on top of 100")
    assert(s(95) == (("new95@x.y", 190.0)), "overlapping key updated")
    assert(s(50) == (("u50@x.y", 50.0)), "untouched key intact")
    assert(s(120) == (("u120@x.y", 120.0)), "new key inserted")
  }
}
