package graft.model

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * A model — the unit a reference user authors as a single SELECT with a
 * `:cursor` named parameter (core/src/lib/sql.ts:22-86). Graft-side a model
 * is a declarative DataFrame builder: parameter substitution becomes an
 * ordinary function argument, so Catalyst sees the final plan (and can push
 * the cursor predicate into the scan — the reference interpolates strings
 * into SQL and gets no such guarantee).
 */
final case class Model(
    name: String,
    /** Build the full (non-incremental) result. */
    build: SparkSession => DataFrame,
    /** Primary key columns — identity for diffs and upserts. */
    keyCols: Seq[String],
    /** Monotone cursor column for incremental syncs, if any. */
    cursorCol: Option[String] = None,
    /** Per-row validity predicates, name → rule (all must hold). */
    validations: Seq[(String, DataFrame => Column)] = Nil,
    /** Destination column mapping: output name → source expression. */
    columnMap: Option[Seq[(String, DataFrame => Column)]] = None,
    /** Incremental build with the last cursor VALUE — used by SQL-text
      * models whose query embeds `:cursor` itself; DataFrame models leave
      * this None and get the runner's `cursorCol > value` filter. */
    buildIncremental: Option[(SparkSession, String) => DataFrame] = None) {

  /** First `n` rows of the model — the reference's `preview` command
    * (core/src/commands/preview.ts: print 10 rows, note truncation).
    * A LIMIT inside the plan, so Spark stops the scan after one partition
    * when it can — never a full materialization. */
  def preview(spark: SparkSession, n: Int = 10): DataFrame = build(spark).limit(n)
}

object Model {
  /** SQL-text model: the reference's authoring surface — a single SELECT
    * with `:name` named parameters (core/src/lib/sql.ts:22-86). Graft
    * binds every parameter through Spark's parameterized SQL, so values
    * arrive as TYPED literals inside the analyzed plan (pushdown-eligible)
    * — never string interpolation.
    *
    * Load-time guards mirror the reference exactly (sql.ts:22-45):
    * multi-statement and non-SELECT model text is rejected, and every
    * declared `:name` must have a value in `params` — except `:cursor`,
    * which the sync runner owns. The full (first) run binds :cursor to
    * NULL, so incremental SQL should read
    * `WHERE :cursor IS NULL OR c > :cursor`, exactly the reference's
    * initial-run convention. */
  def fromSql(name: String, sqlText: String, keyCols: Seq[String],
              cursorCol: Option[String] = None,
              vars: Map[String, String] = Map.empty,
              env: Map[String, String] = sys.env,
              params: Map[String, Any] = Map.empty): Model = {
    // templating (text shaping: {{#if}} blocks, table names) happens ONCE,
    // before parameter binding — `:name` params survive in the rendered SQL.
    val rendered = Template.render(sqlText, vars, env)
    SqlText.requireSingleSelect(rendered)
    val declared = SqlText.namedParams(rendered)
    val hasCursorParam = declared.contains("cursor")
    val missing = declared.filterNot(_ == "cursor").filterNot(params.contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing parameter value for :${missing.head}") // sql.ts:70's complaint
    val bound = params.filter { case (k, _) => declared.contains(k) }
    Model(name,
      build = s =>
        if (hasCursorParam) s.sql(rendered, bound + ("cursor" -> null))
        else if (bound.nonEmpty) s.sql(rendered, bound)
        else s.sql(rendered),
      keyCols = keyCols,
      cursorCol = cursorCol,
      buildIncremental =
        if (hasCursorParam) Some((s, v) => s.sql(rendered, bound + ("cursor" -> v))) else None)
  }
}
