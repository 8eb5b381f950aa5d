package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Warehouse readers — the reference's datasource surface
 * (core/src/datasources/{pg,bigquery,snowlake}.ts) re-expressed as Spark
 * JDBC reads. The reference streams rows single-threaded through one
 * connection; Spark's JDBC source gives the same SQL-shaped access with:
 *
 *  - **predicate/column pushdown**: filters and projections on the
 *    returned DataFrame compile into the remote WHERE/SELECT, so the
 *    warehouse does the pruning (the reference pulls full rows);
 *  - **partitioned parallel reads**: `partitionColumn` + bounds splits
 *    the table into `numPartitions` disjoint range queries executed by
 *    different executors — at 100 TB this is the difference between one
 *    connection streaming for days and a cluster-wide parallel unload;
 *  - **pushed cursor**: an incremental sync passes its cursor predicate
 *    here, so only the increment crosses the wire.
 *
 * Dialect notes: Postgres/Snowflake/BigQuery all speak JDBC; warehouse-
 * specific bulk-unload paths (e.g. Snowflake COPY INTO stage) slot in as
 * alternative `read` implementations behind the same DataFrame contract.
 */
object JdbcSource {

  final case class JdbcTable(
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      /** Numeric/temporal column to range-split parallel reads on. */
      partitionColumn: Option[String] = None,
      lowerBound: Option[String] = None,
      upperBound: Option[String] = None,
      numPartitions: Int = 8,
      /** Per-partition result fetch size (rows per round trip). */
      fetchSize: Int = 10000,
      /** Warehouse dialect: inferred from the URL when None. Drives the
        * post-read schema normalization ([[WarehouseDialect.normalize]])
        * so BigQuery NUMERIC / Snowflake NUMBER / int widths line up
        * across warehouses. */
      dialect: Option[WarehouseDialect] = None)

  /** Read a warehouse table/relation as a DataFrame. `table` may be a
    * table name or a parenthesized subquery alias — the reference's
    * "model is a SELECT" maps to the latter. The result schema is
    * dialect-normalized; pass `dialect = Some(WarehouseDialect.Generic)`
    * for the raw JDBC schema. */
  def read(spark: SparkSession, t: JdbcTable): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", t.url)
      .option("dbtable", t.table)
      .option("fetchsize", t.fetchSize.toString)
    t.user.foreach(u => r = r.option("user", u))
    t.password.foreach(p => r = r.option("password", p))
    t.driver.foreach(d => r = r.option("driver", d))
    (t.partitionColumn, t.lowerBound, t.upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        r = r.option("partitionColumn", c)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", t.numPartitions.toString)
      case _ => ()
    }
    t.dialect.getOrElse(WarehouseDialect.fromUrl(t.url)).normalize(r.load())
  }

  /** Read through a modeled [[WarehouseConnection]] — credentials/session
    * options come from the connection's dialect-specific mapping
    * (reference: core/src/datasources/{pg,bigquery,snowlake}.ts), the
    * partitioned-read knobs from `t`. `t.url`/`t.user`/`t.password`/
    * `t.dialect` are superseded by the connection. */
  def read(spark: SparkSession, conn: WarehouseConnection, t: JdbcTable): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", conn.jdbcUrl)
      .option("dbtable", t.table)
      .option("fetchsize", t.fetchSize.toString)
    conn.options.foreach { case (k, v) => r = r.option(k, v) }
    t.driver.foreach(d => r = r.option("driver", d))
    (t.partitionColumn, t.lowerBound, t.upperBound) match {
      case (Some(c), Some(lo), Some(hi)) =>
        r = r.option("partitionColumn", c)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", t.numPartitions.toString)
      case _ => ()
    }
    conn.dialect.normalize(r.load())
  }
}
