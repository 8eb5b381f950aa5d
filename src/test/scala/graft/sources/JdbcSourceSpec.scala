package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** JDBC warehouse reads against embedded Derby (the only database in this
  * container): round-trip, pushdown into the remote query, and partitioned
  * parallel reads producing disjoint-complete results. */
class JdbcSourceSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE contacts (id INT NOT NULL, email VARCHAR(64), score DOUBLE)")
    val ps = conn.prepareStatement("INSERT INTO contacts VALUES (?, ?, ?)")
    (1 to 500).foreach { i =>
      ps.setInt(1, i); ps.setString(2, s"u$i@example.com"); ps.setDouble(3, i * 0.5)
      ps.addBatch()
    }
    ps.executeBatch()
    conn.close()
  }

  private def table(part: Boolean) = {
    seeded
    JdbcSource.JdbcTable(url = url, table = "contacts",
      partitionColumn = if (part) Some("id") else None,
      lowerBound = if (part) Some("1") else None,
      upperBound = if (part) Some("500") else None,
      numPartitions = 4)
  }

  test("round-trips rows and schema") {
    val df = JdbcSource.read(spark, table(part = false))
    assert(df.count() == 500)
    assert(df.columns.map(_.toLowerCase).sorted.toSeq == Seq("email", "id", "score"))
  }

  test("filters push into the remote query (PushedFilters in scan)") {
    val df = JdbcSource.read(spark, table(part = false)).filter(col("id") > 400)
    assert(df.count() == 100)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"), plan)
  }

  test("partitioned read: 4 disjoint range queries, complete result") {
    val df = JdbcSource.read(spark, table(part = true))
    assert(df.rdd.getNumPartitions == 4, "ranges must map to Spark partitions")
    assert(df.select(sum(col("id"))).as[Long].head() == 500L * 501 / 2, "no loss, no overlap")
  }

  test("subquery relation: the reference's model-is-a-SELECT shape") {
    val sub = table(part = false).copy(
      table = "(SELECT id, email FROM contacts WHERE id <= 10) m")
    val df = JdbcSource.read(spark, sub)
    assert(df.count() == 10 && df.columns.length == 2)
  }
}
