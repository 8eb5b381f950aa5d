package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/**
 * Schema-driven row validation — the reference derives a zod validator
 * from the declared row type and checks every row before it reaches the
 * destination (core/src/commands/sync.ts:557-558; studied, not ported).
 * Graft derives named per-rule Column predicates from a declared
 * StructType, so the same declaration drives validation, the error
 * threshold, and per-rule failure reporting — as codegen'd expressions
 * inside the sync plan, not a per-row interpreter.
 *
 * Generated rules per field:
 *  - `<field>_required`  — non-nullable fields must be present
 *  - `<field>_type`      — the value coerces to the declared type
 *    (emitted only when the incoming column's type differs; `try_cast`
 *    so malformed values fail the RULE, not the job, under ANSI mode)
 *  - metadata-driven, when the field's metadata carries the key:
 *      "enum" (string array) — value ∈ allowed set
 *      "minValue"/"maxValue" (double) — numeric range
 *      "maxLength" (long) — max string length
 *      "pattern" (string) — regex the full value must match
 *
 * Null values pass every rule except `_required` (nullability is its own
 * declaration, exactly like zod's `.optional()`).
 */
object SchemaValidation {

  /** Validation rules for `schema`, pluggable into [[Model.validations]]. */
  def rules(schema: StructType): Seq[(String, DataFrame => Column)] =
    schema.fields.toSeq.flatMap(fieldRules)

  private def fieldRules(f: StructField): Seq[(String, DataFrame => Column)] = {
    val name = f.name
    def c = col(name)
    val m = f.metadata
    /** The value in declared-type space: raw when types already agree,
      * try_cast otherwise — so range rules never hit an ANSI cast error on
      * a malformed value (it's null here and fails only the _type rule). */
    def cv(df: DataFrame): Column =
      if (df.schema(name).dataType == f.dataType) c
      else expr(s"try_cast(`$name` AS ${f.dataType.sql})")
    val required: Seq[(String, DataFrame => Column)] =
      if (f.nullable) Nil else Seq(s"${name}_required" -> ((_: DataFrame) => c.isNotNull))
    val typed: Seq[(String, DataFrame => Column)] = Seq(
      s"${name}_type" -> ((df: DataFrame) =>
        if (df.schema(name).dataType == f.dataType) lit(true)
        else c.isNull || cv(df).isNotNull))
    val enumRule = if (m.contains("enum"))
      Seq(s"${name}_enum" -> ((_: DataFrame) =>
        c.isNull || c.isin(m.getStringArray("enum").toIndexedSeq: _*))) else Nil
    val minRule = if (m.contains("minValue"))
      Seq(s"${name}_min" -> ((df: DataFrame) =>
        cv(df).isNull || cv(df) >= lit(m.getDouble("minValue")))) else Nil
    val maxRule = if (m.contains("maxValue"))
      Seq(s"${name}_max" -> ((df: DataFrame) =>
        cv(df).isNull || cv(df) <= lit(m.getDouble("maxValue")))) else Nil
    val lenRule = if (m.contains("maxLength"))
      Seq(s"${name}_maxlen" -> ((_: DataFrame) =>
        c.isNull || length(c) <= lit(m.getLong("maxLength")))) else Nil
    val patRule = if (m.contains("pattern"))
      Seq(s"${name}_pattern" -> ((_: DataFrame) =>
        c.isNull || regexp_like(c, lit(m.getString("pattern"))))) else Nil
    required ++ typed ++ enumRule ++ minRule ++ maxRule ++ lenRule ++ patRule
  }

  /** Per-rule failure counts in ONE aggregation pass (partial map-side):
    * a single row, one BIGINT column per rule — the "invalid format of a
    * row" report, computed at scan speed over any data size. */
  def failureCounts(df: DataFrame, schema: StructType): DataFrame = {
    val rs = rules(schema)
    val aggs = rs.map { case (rname, rule) =>
      sum(when(!rule(df), 1L).otherwise(0L)).as(rname)
    }
    df.agg(aggs.head, aggs.tail: _*)
  }
}
