package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Per-warehouse dialect shims — the reference ships one reader per
 * warehouse with its own native→generic type mapping and parameter
 * typing (core/src/datasources/pg.ts:16-30, bigquery.ts:104-121,
 * snowlake.ts:137-155, types.ts); graft keeps ONE JDBC reader
 * ([[JdbcSource]]) and concentrates the per-warehouse differences here:
 *
 *  - `genericType(native)` reproduces each reference reader's
 *    native-type → generic-type table (the 5-type protocol contract of
 *    types.ts: integer | string | boolean | date | float);
 *  - `timestampParamType` is the cast target each reference datasource
 *    uses when a Date parameter lands in SQL (index.ts:40-67:
 *    genericToQueryParameter's dialect-specific TIMESTAMP type);
 *  - `normalize(df)` lines the POST-READ Spark schema up across
 *    warehouses so downstream operators see one shape: sub-long
 *    integrals widen to long, float32 widens to double, and the
 *    dialect-specific decimal conventions apply (BigQuery NUMERIC and
 *    Snowflake NUMBER carry scale-0 integers that should be longs, and
 *    true decimals that the 5-type contract reads as float). Postgres
 *    NUMERIC stays DecimalType — the reference's pg driver degrades it
 *    to a string, which graft deliberately does NOT mirror (exact money
 *    math is the better contract; documented divergence). Snowflake
 *    VARIANT/OBJECT/ARRAY arrive through JDBC as JSON text and stay
 *    strings — `from_json` / `get_json_object` are the access path.
 */
sealed trait WarehouseDialect {
  def name: String

  /** The reference's native→generic mapping for this warehouse. */
  def genericType(nativeType: String): String

  /** SQL type a timestamp parameter is cast to in pushed-down SQL. */
  def timestampParamType: String

  /** Decimal handling when normalizing a read schema: None = keep. */
  protected def normalizeDecimal(d: DecimalType): Option[DataType]

  /** Normalize a freshly-read DataFrame's schema for this dialect. */
  final def normalize(df: DataFrame): DataFrame = {
    val casts = df.schema.fields.flatMap { f =>
      val target: Option[DataType] = f.dataType match {
        case ByteType | ShortType | IntegerType => Some(LongType)
        case FloatType => Some(DoubleType)
        case d: DecimalType => normalizeDecimal(d)
        case _ => None
      }
      target.map(t => f.name -> t)
    }.toMap
    if (casts.isEmpty) df
    else df.select(df.columns.map(c =>
      casts.get(c).map(t => col(c).cast(t).as(c)).getOrElse(col(c))): _*)
  }
}

object WarehouseDialect {

  /** BigQuery/Snowflake decimal convention: scale-0 relations are
    * integer-like and narrow to LongType — but ONLY while every value
    * provably fits (precision ≤ 18; a 19-digit decimal can exceed
    * Long.MaxValue and would null out with ANSI off or fail with ANSI
    * on). Wider scale-0 decimals — Snowflake's default NUMBER(38,0)
    * included — stay DecimalType; declared scale is the 5-type
    * contract's float. */
  private[sources] def scaleSplitDecimal(d: DecimalType): Option[DataType] =
    if (d.scale == 0) { if (d.precision <= 18) Some(LongType) else None }
    else Some(DoubleType)

  /** postgres.ts:16-30 — prefix rules, everything else degrades to string. */
  case object Postgres extends WarehouseDialect {
    val name = "postgres"
    def genericType(nativeType: String): String = {
      val t = nativeType.toLowerCase
      if (t == "text" || t == "varchar" || t == "char" || t == "bpchar") "string"
      else if (t.startsWith("int") || t == "serial" || t == "bigserial") "integer"
      else if (t.startsWith("bool")) "boolean"
      else if (t.startsWith("timestamp") || t == "date") "date"
      else if (t.startsWith("float") || t.startsWith("double") || t == "real") "float"
      else "string" // pg.ts:28 — numeric, json, uuid, arrays all fall here
    }
    val timestampParamType = "TIMESTAMP WITH TIME ZONE" // pg.ts:67
    // keep pg NUMERIC exact (deliberate divergence from the string fallback)
    protected def normalizeDecimal(d: DecimalType): Option[DataType] = None
  }

  /** bigquery.ts:104-121 — exact native names from the BQ job schema. */
  case object BigQuery extends WarehouseDialect {
    val name = "bigquery"
    def genericType(nativeType: String): String = nativeType.toUpperCase match {
      case "STRING" => "string"
      case "INT64" | "INTEGER" => "integer"
      case "NUMERIC" | "BIGNUMERIC" | "FLOAT64" | "FLOAT" => "float"
      case "BOOL" | "BOOLEAN" => "boolean"
      case "DATE" | "DATETIME" | "TIMESTAMP" => "date"
      case _ => "string" // ARRAY/STRUCT/JSON/GEOGRAPHY → string, bigquery.ts:120
    }
    val timestampParamType = "TIMESTAMP" // bigquery.ts:44
    // BQ NUMERIC(38,9)/BIGNUMERIC: scale-0 relations are integer-like,
    // anything carrying scale is the 5-type contract's float
    protected def normalizeDecimal(d: DecimalType): Option[DataType] =
      WarehouseDialect.scaleSplitDecimal(d)
  }

  /** snowlake.ts:137-155 — Snowflake NUMBER(p,s) covers ints and decimals. */
  case object Snowflake extends WarehouseDialect {
    val name = "snowflake"
    def genericType(nativeType: String): String = {
      val t = nativeType.toUpperCase
      val base = t.takeWhile(c => c != '(').trim
      base match {
        case "VARCHAR" | "CHAR" | "CHARACTER" | "STRING" | "TEXT" => "string"
        case "BOOLEAN" => "boolean"
        case "DATE" | "DATETIME" | "TIME" | "TIMESTAMP" | "TIMESTAMP_LTZ" |
             "TIMESTAMP_NTZ" | "TIMESTAMP_TZ" => "date"
        case "NUMBER" | "NUMERIC" | "DECIMAL" =>
          // NUMBER(p,0) is Snowflake's integer; any declared scale → float
          val scale = raw"\(\s*\d+\s*,\s*(\d+)\s*\)".r
            .findFirstMatchIn(t).map(_.group(1).toInt).getOrElse(0)
          if (scale == 0) "integer" else "float"
        case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "TINYINT" | "BYTEINT" => "integer"
        case "FLOAT" | "FLOAT4" | "FLOAT8" | "DOUBLE" | "REAL" => "float"
        case "VARIANT" | "OBJECT" | "ARRAY" => "string" // JSON text over JDBC
        case _ => "string"
      }
    }
    val timestampParamType = "TIMESTAMP_TZ"
    protected def normalizeDecimal(d: DecimalType): Option[DataType] =
      WarehouseDialect.scaleSplitDecimal(d)
  }

  /** MySQL — the reference lists it "coming soon"
    * (docs/references/sources/mysql.mdx); graft delivers it through the
    * same JDBC reader. OLTP money convention: DECIMAL stays exact, like
    * Postgres. TINYINT(1)/BIT(1) is MySQL's boolean spelling. */
  case object MySql extends WarehouseDialect {
    val name = "mysql"
    def genericType(nativeType: String): String = {
      val t = nativeType.toUpperCase
      // base = first word before any width: 'BIGINT UNSIGNED' and
      // 'INT(11) UNSIGNED' both match on their integral base (MySQL
      // 8.0.17+ reports unsigned columns exactly like this)
      val base = t.takeWhile(_ != '(').trim.split("\\s+").head
      base match {
        case "TINYINT" | "BIT" =>
          // TINYINT(1)/BIT(1) is the boolean convention; wider is
          // integral. Bare BIT defaults to BIT(1) (MySQL's own M=1
          // default); bare TINYINT is the 4-wide integral.
          val width = raw"\(\s*(\d+)\s*\)".r
            .findFirstMatchIn(t).map(_.group(1).toInt)
            .getOrElse(if (base == "BIT") 1 else 4)
          if (width == 1) "boolean" else "integer"
        case "INT" | "INTEGER" | "BIGINT" | "SMALLINT" | "MEDIUMINT" |
             "SERIAL" | "YEAR" => "integer"
        case "BOOL" | "BOOLEAN" => "boolean"
        case "VARCHAR" | "CHAR" | "TEXT" | "TINYTEXT" | "MEDIUMTEXT" |
             "LONGTEXT" | "ENUM" | "SET" | "JSON" => "string"
        case "DATE" | "DATETIME" | "TIMESTAMP" | "TIME" => "date"
        case "FLOAT" | "DOUBLE" | "REAL" | "DECIMAL" | "NUMERIC" => "float"
        case _ => "string"
      }
    }
    val timestampParamType = "DATETIME"
    // exact money math, like Postgres (documented divergence from the
    // 5-type contract's float)
    protected def normalizeDecimal(d: DecimalType): Option[DataType] = None
  }

  /** ClickHouse — the reference points users at its Postgres-protocol
    * proxy "meanwhile" (docs/references/sources/clickhouse.mdx); graft
    * speaks to it natively over JDBC. OLAP decimal convention: scale-0
    * narrows to long like BigQuery/Snowflake. Nullable(T)/LowCardinality
    * (T) wrappers unwrap before the type match. */
  case object ClickHouse extends WarehouseDialect {
    val name = "clickhouse"
    def genericType(nativeType: String): String = {
      var t = nativeType.trim
      // unwrap Nullable(...) / LowCardinality(...) (possibly nested)
      val wrapper = raw"(?i)^(Nullable|LowCardinality)\((.*)\)$$".r
      var changed = true
      while (changed) changed = t match {
        case wrapper(_, inner) => t = inner.trim; true
        case _ => false
      }
      val base = t.toUpperCase.takeWhile(_ != '(').trim
      base match {
        case "INT8" | "INT16" | "INT32" | "INT64" | "INT128" | "INT256" |
             "UINT8" | "UINT16" | "UINT32" | "UINT64" | "UINT128" |
             "UINT256" => "integer"
        case "BOOL" | "BOOLEAN" => "boolean"
        case "STRING" | "FIXEDSTRING" | "ENUM8" | "ENUM16" | "UUID" | "IPV4" |
             "IPV6" => "string"
        case "DATE" | "DATE32" | "DATETIME" | "DATETIME64" => "date"
        case "FLOAT32" | "FLOAT64" | "DECIMAL" | "DECIMAL32" | "DECIMAL64" |
             "DECIMAL128" | "DECIMAL256" => "float"
        case _ => "string" // arrays, maps, tuples: JSON-ish text
      }
    }
    val timestampParamType = "DateTime64(3)"
    protected def normalizeDecimal(d: DecimalType): Option[DataType] =
      WarehouseDialect.scaleSplitDecimal(d)
  }

  /** Unknown warehouses: no coercion beyond integral/float widening. */
  case object Generic extends WarehouseDialect {
    val name = "generic"
    def genericType(nativeType: String): String = "string"
    val timestampParamType = "TIMESTAMP"
    protected def normalizeDecimal(d: DecimalType): Option[DataType] = None
  }

  /** Infer the dialect from a JDBC URL (the reference routes on the
    * datasource's URL scheme/type tag, datasources/index.ts). */
  def fromUrl(url: String): WarehouseDialect = {
    val u = url.toLowerCase
    if (u.startsWith("jdbc:postgresql:") || u.startsWith("postgresql://") ||
        u.startsWith("postgres://")) Postgres
    else if (u.contains("bigquery")) BigQuery
    else if (u.startsWith("jdbc:snowflake:")) Snowflake
    else if (u.startsWith("jdbc:mysql:") || u.startsWith("jdbc:mariadb:") ||
        u.startsWith("mysql://")) MySql
    else if (u.startsWith("jdbc:clickhouse:") || u.startsWith("jdbc:ch:") ||
        u.startsWith("clickhouse://")) ClickHouse
    else Generic
  }
}
