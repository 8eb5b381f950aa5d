package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-warehouse dialect shims: the reference readers' native→generic
  * type tables, URL routing, and post-read schema normalization. */
class WarehouseDialectSpec extends SparkSuite {
  import spark.implicits._
  import WarehouseDialect._

  test("postgres generic types mirror pg.ts:16-30") {
    val cases = Seq(
      "text" -> "string", "varchar" -> "string", "int4" -> "integer",
      "int8" -> "integer", "bigserial" -> "integer", "bool" -> "boolean",
      "timestamptz" -> "date", "timestamp" -> "date", "date" -> "date",
      "float8" -> "float", "real" -> "float",
      // pg.ts:28's catch-all: numeric/json/uuid degrade to string
      "numeric" -> "string", "jsonb" -> "string", "uuid" -> "string")
    cases.foreach { case (native, generic) =>
      assert(Postgres.genericType(native) == generic, s"pg $native")
    }
    assert(Postgres.timestampParamType == "TIMESTAMP WITH TIME ZONE")
  }

  test("bigquery generic types mirror bigquery.ts:104-121") {
    val cases = Seq(
      "STRING" -> "string", "INT64" -> "integer", "NUMERIC" -> "float",
      "BIGNUMERIC" -> "float", "FLOAT64" -> "float", "BOOL" -> "boolean",
      "DATE" -> "date", "DATETIME" -> "date", "TIMESTAMP" -> "date",
      "ARRAY" -> "string", "STRUCT" -> "string", "GEOGRAPHY" -> "string")
    cases.foreach { case (native, generic) =>
      assert(BigQuery.genericType(native) == generic, s"bq $native")
    }
    assert(BigQuery.timestampParamType == "TIMESTAMP")
  }

  test("snowflake generic types mirror snowlake.ts:137-155, NUMBER scale splits int/float") {
    val cases = Seq(
      "VARCHAR(16777216)" -> "string", "TEXT" -> "string",
      "NUMBER(38,0)" -> "integer", "NUMBER(10, 2)" -> "float",
      "DECIMAL(9,3)" -> "float", "INT" -> "integer", "BIGINT" -> "integer",
      "FLOAT" -> "float", "DOUBLE" -> "float", "BOOLEAN" -> "boolean",
      "TIMESTAMP_NTZ" -> "date", "TIMESTAMP_TZ" -> "date", "DATE" -> "date",
      "VARIANT" -> "string", "OBJECT" -> "string", "ARRAY" -> "string")
    cases.foreach { case (native, generic) =>
      assert(Snowflake.genericType(native) == generic, s"sf $native")
    }
  }

  test("URL routing picks the dialect") {
    assert(fromUrl("jdbc:postgresql://h/db") == Postgres)
    assert(fromUrl("postgres://u@h/db") == Postgres)
    assert(fromUrl("jdbc:bigquery://https://www.googleapis.com/bigquery/v2;ProjectId=p") == BigQuery)
    assert(fromUrl("jdbc:snowflake://acct.snowflakecomputing.com/") == Snowflake)
    assert(fromUrl("jdbc:derby:memory:x") == Generic)
  }

  test("normalize: BigQuery/Snowflake decimals split on scale; pg keeps NUMERIC exact") {
    val df = Seq((1, 2.5f, BigDecimal("42"), BigDecimal("12.34")))
      .toDF("i", "f", "d0", "d2")
      .select(col("i").cast(IntegerType).as("i"), col("f").cast(FloatType).as("f"),
        col("d0").cast(DecimalType(38, 0)).as("d0"),
        col("d2").cast(DecimalType(10, 2)).as("d2"))

    def types(out: org.apache.spark.sql.DataFrame): Map[String, DataType] =
      out.schema.fields.map(f => f.name -> f.dataType).toMap

    val bq = types(BigQuery.normalize(df))
    assert(bq("i") == LongType && bq("f") == DoubleType)
    assert(bq("d0") == LongType, "scale-0 NUMERIC is integer-like")
    assert(bq("d2") == DoubleType, "scaled NUMERIC is the 5-type contract's float")
    assert(types(Snowflake.normalize(df))("d0") == LongType)

    val pg = types(Postgres.normalize(df))
    assert(pg("d0") == DecimalType(38, 0) && pg("d2") == DecimalType(10, 2),
      "pg NUMERIC stays exact (documented divergence from the string fallback)")
    assert(pg("i") == LongType, "integral widening applies everywhere")

    // values survive the coercion
    val row = BigQuery.normalize(df).as[(Long, Double, Long, Double)].head()
    assert(row == ((1L, 2.5d, 42L, 12.34d)))
  }
}
