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
    * with a `:cursor` named parameter (core/src/lib/sql.ts:22-86). Graft
    * binds it through Spark's parameterized SQL, so the cursor arrives as
    * a TYPED literal inside the analyzed plan (pushdown-eligible) — never
    * string interpolation. The full (first) run binds :cursor to NULL, so
    * incremental SQL should read `WHERE :cursor IS NULL OR c > :cursor`,
    * exactly the reference's initial-run convention. */
  def fromSql(name: String, sqlText: String, keyCols: Seq[String],
              cursorCol: Option[String] = None,
              vars: Map[String, String] = Map.empty,
              env: Map[String, String] = sys.env): Model = {
    // templating (text shaping) happens ONCE, before parameter binding —
    // `:cursor` survives as a typed parameter in the rendered SQL.
    val rendered = Template.render(sqlText, vars, env)
    val hasCursorParam = rendered.contains(":cursor")
    Model(name,
      build = s => if (hasCursorParam) s.sql(rendered, Map("cursor" -> null)) else s.sql(rendered),
      keyCols = keyCols,
      cursorCol = cursorCol,
      buildIncremental =
        if (hasCursorParam) Some((s, v) => s.sql(rendered, Map("cursor" -> v))) else None)
  }
}
