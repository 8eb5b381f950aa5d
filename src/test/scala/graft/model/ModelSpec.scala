package graft.model

import graft.SparkSuite
import graft.state.StateStore
import graft.sync.SyncRunner
import org.apache.spark.sql.DataFrame

import scala.collection.mutable.ArrayBuffer

/** The reference's SQL authoring surface: a single SELECT with a `:cursor`
  * named parameter, bound as a typed literal via parameterized SQL. */
class ModelSpec extends SparkSuite {
  import spark.implicits._

  private lazy val view: Unit =
    spark.read.parquet(s"$sfDir/orders.parquet").createOrReplaceTempView("orders_v")

  private def sqlModel = {
    view
    Model.fromSql(
      name = "orders_sql",
      sqlText = """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
                  |FROM orders_v
                  |WHERE :cursor IS NULL OR o_orderdate > :cursor""".stripMargin,
      keyCols = Seq("o_orderkey"),
      cursorCol = Some("o_orderdate"))
  }

  test(":cursor binds NULL on the first run (full read) and the value after") {
    val store = StateStore.inMemory()
    val runner = new SyncRunner(store)
    val seen = ArrayBuffer.empty[Long]
    def sink(df: DataFrame): Unit = seen += df.count()

    val r1 = runner.run(spark, sqlModel, "sql1", sink)
    assert(r1.rowsIn > 0 && !r1.incremental, "first run reads everything")
    assert(r1.newCursor.isDefined)

    val r2 = runner.run(spark, sqlModel, "sql1", sink)
    assert(r2.incremental)
    assert(r2.rowsIn == 0, "cursor bound into the SQL filters all old rows")
    assert(seen.head > 0 && seen(1) == 0)
  }

  test(":cursor mid-stream: only rows past the persisted cursor flow") {
    val store = StateStore.inMemory()
    val runner = new SyncRunner(store)
    // plant a mid-range cursor, as if a prior run checkpointed there
    store.set(Seq("syncId=sql2", "$lastCursor"), "1998-01-01")
    val seen = ArrayBuffer.empty[Long]
    runner.run(spark, sqlModel, "sql2", df => seen += df.count())

    view
    val expected = spark.sql(
      "SELECT COUNT(*) FROM orders_v WHERE o_orderdate > DATE '1998-01-01'")
      .as[Long].head()
    assert(seen.head == expected, s"got ${seen.head}, want $expected")
    assert(expected > 0, "fixture must leave rows past the planted cursor")
  }

  test("template vars substitute into SQL text while :cursor stays a typed param") {
    view
    val m = Model.fromSql(
      name = "templated",
      sqlText = """SELECT o_orderkey, o_orderdate FROM {{ table }}
                  |WHERE (:cursor IS NULL OR o_orderdate > :cursor)
                  |  AND o_totalprice > {{ min_price }}""".stripMargin,
      keyCols = Seq("o_orderkey"),
      cursorCol = Some("o_orderdate"),
      vars = Map("table" -> "orders_v", "min_price" -> "1000"))
    val full = m.build(spark).count()
    assert(full > 0, "rendered FROM/threshold must produce rows")
    val expected = spark.sql(
      "SELECT COUNT(*) FROM orders_v WHERE o_totalprice > 1000").as[Long].head()
    assert(full == expected)
    // :cursor binding still typed after rendering
    val inc = m.buildIncremental.get(spark, "1998-01-01").count()
    assert(inc < full && inc > 0)
  }

  test("template env lookup and strict unknown-variable failure") {
    val r = Template.render("SELECT * FROM {{ env.GRAFT_T }} LIMIT {{ n }}",
      vars = Map("n" -> "5"), env = Map("GRAFT_T" -> "t1"))
    assert(r == "SELECT * FROM t1 LIMIT 5")
    val e = intercept[IllegalArgumentException] {
      Template.render("{{ missing }}", vars = Map("other" -> "x"))
    }
    assert(e.getMessage.contains("missing") && e.getMessage.contains("other"))
  }

  test("Handlebars blocks: {{#if}}/{{else}} shape optional SQL clauses") {
    view
    def m(withFilter: Boolean) = Model.fromSql(
      name = "conditional",
      sqlText = """SELECT o_orderkey FROM orders_v
                  |{{#if min_price}}WHERE o_totalprice > {{ min_price }}{{else}}WHERE 1 = 1{{/if}}""".stripMargin,
      keyCols = Seq("o_orderkey"),
      vars = if (withFilter) Map("min_price" -> "100000") else Map.empty)
    val all = m(withFilter = false).build(spark).count()
    val filtered = m(withFilter = true).build(spark).count()
    assert(all > filtered && filtered > 0, "undefined condition takes the else branch")
  }

  test("Handlebars {{#each}} renders IN-lists with this/@index scoping") {
    val r = Template.renderAny(
      "WHERE status IN ({{#each statuses}}{{#if @index}}, {{/if}}'{{this}}'{{/each}})",
      Map("statuses" -> Seq("O", "F", "P")))
    assert(r == "WHERE status IN ('O', 'F', 'P')")
    val objs = Template.renderAny(
      "{{#each cols}}{{name}}:{{kind}};{{/each}}",
      Map("cols" -> Seq(Map("name" -> "id", "kind" -> "long"),
                        Map("name" -> "txt", "kind" -> "string"))))
    assert(objs == "id:long;txt:string;")
    // {{#unless}} is the negated form
    assert(Template.renderAny("{{#unless x}}fallback{{/unless}}", Map.empty) == "fallback")
    // unbalanced blocks fail at render, not silently
    intercept[IllegalArgumentException](Template.render("{{#if a}}oops", Map("a" -> "1")))
  }

  test("arbitrary :name params bind as typed literals; missing ones fail at load") {
    view
    val m = Model.fromSql(
      name = "params",
      sqlText = """SELECT o_orderkey, o_orderdate FROM orders_v
                  |WHERE o_orderdate >= :start_date AND o_totalprice > :min_total
                  |  AND (:cursor IS NULL OR o_orderdate > :cursor)""".stripMargin,
      keyCols = Seq("o_orderkey"),
      cursorCol = Some("o_orderdate"),
      params = Map("start_date" -> java.sql.Date.valueOf("1997-01-01"), "min_total" -> 1000))
    val full = m.build(spark).count()
    val expected = spark.sql(
      """SELECT COUNT(*) FROM orders_v
        |WHERE o_orderdate >= DATE '1997-01-01' AND o_totalprice > 1000""".stripMargin)
      .as[Long].head()
    assert(full == expected && full > 0)
    // the cursor layers on top of the user params
    val inc = m.buildIncremental.get(spark, "1998-01-01").count()
    assert(inc > 0 && inc < full)

    val e = intercept[IllegalArgumentException] {
      Model.fromSql("bad", "SELECT 1 FROM orders_v WHERE o_custkey = :segment", Seq("o_orderkey"))
    }
    assert(e.getMessage == "Missing parameter value for :segment")
    // ::casts and :text inside literals are NOT parameters
    assert(SqlText.namedParams(
      "SELECT a::int, ':not_me' AS s, b FROM t WHERE c = :real -- :also_not\n") == Seq("real"))
  }

  test("non-SELECT and multi-statement model SQL are rejected at load") {
    val drop = intercept[IllegalArgumentException] {
      Model.fromSql("evil", "DROP TABLE orders_v", Seq("k"))
    }
    assert(drop.getMessage == "SQL query must be a SELECT statement")
    val multi = intercept[IllegalArgumentException] {
      Model.fromSql("evil2", "SELECT 1; DROP TABLE orders_v", Seq("k"))
    }
    assert(multi.getMessage.contains("multiple (2) statements"))
    // trailing semicolon and WITH-SELECT are both legitimate
    view
    assert(Model.fromSql("ok", "WITH c AS (SELECT o_orderkey FROM orders_v) SELECT * FROM c;",
      Seq("o_orderkey")).build(spark).count() > 0)
    // a ';' INSIDE a string literal is not a statement separator
    assert(Model.fromSql("ok2", "SELECT 'a;b' AS s FROM orders_v LIMIT 1",
      Seq("s")).build(spark).count() == 1)
    // backslash-escaped quotes (Spark's default parser accepts them) must
    // not desynchronize the literal scan: the ';' and ':x' here are text
    assert(SqlText.namedParams(raw"SELECT 'it\'s; fine :x' AS s, '\\' AS t WHERE c = :real") ==
      Seq("real"))
    assert(Model.fromSql("ok3", raw"SELECT 'it\'s; really' AS s FROM orders_v LIMIT 1",
      Seq("s")).build(spark).count() == 1)
  }

  test("SQL without :cursor builds plainly (no parameter binding needed)") {
    view
    val m = Model.fromSql("plain", "SELECT o_orderkey FROM orders_v", Seq("o_orderkey"))
    assert(m.buildIncremental.isEmpty)
    assert(m.build(spark).count() > 0)
  }

  test("preview returns a plan-level LIMIT of the model") {
    view
    val m = Model.fromSql("p", "SELECT o_orderkey FROM orders_v", Seq("o_orderkey"))
    assert(m.preview(spark, 10).count() == 10)
    assert(m.preview(spark).queryExecution.optimizedPlan.toString.contains("GlobalLimit 10"))
  }
}
