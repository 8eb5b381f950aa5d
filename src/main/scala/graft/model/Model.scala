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
    columnMap: Option[Seq[(String, DataFrame => Column)]] = None)

object Model {
  /** SQL-text model: the closest shape to the reference's authoring surface
    * — `spark.sql` with the cursor passed through `sql` args templating
    * done HERE (engine-side, typed), not string concatenation. */
  def fromSql(name: String, sql: String, keyCols: Seq[String],
              cursorCol: Option[String] = None): Model =
    Model(name, s => s.sql(sql), keyCols, cursorCol)
}
