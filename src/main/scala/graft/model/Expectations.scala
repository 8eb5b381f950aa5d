package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-level data-quality EXPECTATIONS — the dbt-test / checks-before-sync
 * surface that complements [[SchemaValidation]] (per-ROW rules): uniqueness,
 * non-nullness, accepted values, referential integrity against a dimension,
 * and freshness, folded into one (expectation, failures, passed) report a
 * pipeline gates on before trusting a model.
 *
 * Scale design (100 TB fact):
 *  - every TABLE-LOCAL expectation (unique / not-null / accepted / fresh)
 *    compiles into ONE wide aggregate over a single scan — uniqueness
 *    rides the multi-distinct Expand (the q108 pattern) — and the wide
 *    row unpivots to report rows with a bounded-fan-out stack();
 *  - referential integrity is a per-FK anti-join COUNT (broadcast when
 *    the dimension fits, shuffle otherwise) — the only non-scan-local
 *    work, proportional to the number of declared FKs.
 */
object Expectations {

  sealed trait TableLocal { def name: String; private[model] def failures: Column }

  /** Surplus rows beyond one per distinct key. SQL COUNT(DISTINCT ...)
    * semantics: a row with a NULL key component is never a distinct key,
    * so every such row counts as surplus — a NULL key cannot be unique. */
  final case class Unique(cols: Seq[String]) extends TableLocal {
    val name = s"unique:${cols.mkString(",")}"
    private[model] def failures: Column =
      (count(lit(1)) - countDistinct(col(cols.head), cols.tail.map(col): _*)).as(name)
  }

  /** Rows with a NULL value. */
  final case class NotNull(c: String) extends TableLocal {
    val name = s"not_null:$c"
    private[model] def failures: Column = count(when(col(c).isNull, 1)).as(name)
  }

  /** Non-null rows outside the accepted set. */
  final case class AcceptedValues(c: String, values: Seq[String]) extends TableLocal {
    val name = s"accepted:$c"
    private[model] def failures: Column =
      count(when(col(c).isNotNull && !col(c).isin(values: _*), 1)).as(name)
  }

  /** 1 when max(tsCol) is older than the threshold (stale table), else 0.
    * An EMPTY table (max = NULL) counts as stale — no rows at all is the
    * stalest possible state, not a pass. */
  final case class Freshness(tsCol: String, noOlderThan: String) extends TableLocal {
    val name = s"freshness:$tsCol"
    private[model] def failures: Column =
      when(max(col(tsCol)).isNull ||
           max(col(tsCol)) < lit(noOlderThan).cast("timestamp"), 1L)
        .otherwise(0L).as(name)
  }

  /** Non-null FK values that do not resolve in the dimension. */
  final case class RefIntegrity(fkCol: String, dimLabel: String,
                                dim: DataFrame, dimKey: String) {
    val name = s"fk:$fkCol->$dimLabel"
  }

  /** One (expectation, failures, passed) row per declared expectation,
    * ordered by name. */
  def report(df: DataFrame, local: Seq[TableLocal],
             fks: Seq[RefIntegrity] = Nil): DataFrame = {
    require(local.nonEmpty, "at least one table-local expectation")
    val names = local.map(_.name) ++ fks.map(_.name)
    require(names.distinct.size == names.size, s"duplicate expectation names: $names")
    val wide = df.agg(local.head.failures, local.tail.map(_.failures): _*)
    val stackArgs = local.map(e => s"'${e.name}', `${e.name}`").mkString(", ")
    val localRows = wide.select(
      expr(s"stack(${local.size}, $stackArgs) AS (expectation, failures)"))
    val fkRows = fks.map { fk =>
      df.filter(col(fk.fkCol).isNotNull)
        .join(fk.dim.select(col(fk.dimKey).as("__dk")),
              col(fk.fkCol) === col("__dk"), "left_anti")
        .agg(count(lit(1)).as("failures"))
        .select(lit(fk.name).as("expectation"), col("failures"))
    }
    fkRows.foldLeft(localRows)(_ unionByName _)
      .withColumn("failures", col("failures").cast("long"))
      .withColumn("passed", col("failures") === 0L)
      .orderBy("expectation")
  }
}
