package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Lazy accessors for the warehouse tables under one scale-factor dir. */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame    = t("region")
  def nation: DataFrame    = t("nation")
  def customer: DataFrame  = t("customer")
  def supplier: DataFrame  = t("supplier")
  def part: DataFrame      = t("part")
  def orders: DataFrame    = t("orders")
  def lineitem: DataFrame  = t("lineitem")
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** events.ts normalized to epoch-NANOS long, whatever the writer chose:
    * TIMESTAMP(NANOS) files read as long directly (nanosAsLong), and
    * TIMESTAMP(MICROS) files (NTZ or LTZ logical type) convert via
    * unix_micros ×1000. All downstream arithmetic (`ts div 1000L` → µs,
    * `ts div 86400000000000` → days) and the DuckDB oracles' logical
    * epoch_us()/epoch_ns() stay exact either way. NTZ→LTZ cast uses the
    * session timezone, which GraftSession pins to UTC. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
}

/** Cross-engine-exact column helpers.
  *
  * The correctness oracle hash-compares Spark output against DuckDB. Double
  * aggregation is partition-order dependent, so all money/quantity math is
  * done in DecimalType (exact, associative) and only the FINAL value is cast
  * back to double — both engines convert the same exact decimal to the same
  * IEEE double.
  */
object Q {
  val Dec: DecimalType = DecimalType(18, 2)
  def dec(c: Column): Column = c.cast(Dec)
  def money(c: Column): Column = c.cast("double")
  /** Exact decimal revenue term: extendedprice * (1 - discount). */
  def revenueTerm(price: Column, discount: Column): Column =
    dec(price) * (lit(1).cast(Dec) - dec(discount))
}
