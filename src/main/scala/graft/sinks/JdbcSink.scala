package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}

import java.sql.DriverManager

/**
 * JDBC sink — reverse-ETL's write side to operational stores.
 *
 * Two modes:
 *  - `append`: Spark's native JDBC writer — one connection per partition,
 *    batched inserts, fully parallel.
 *  - `upsert`: per-partition two-phase batched UPDATE-then-INSERT on the
 *    key columns — the insert-or-update the reference connectors perform
 *    row-at-a-time over HTTP, here executed as executor-parallel
 *    statement batches: one UPDATE batch, then one INSERT batch for the
 *    rows whose update count was 0. This spelling works on every JDBC
 *    dialect (Derby included — its MERGE rejects VALUES sources);
 *    dialect-specific fast paths (`MERGE`, `INSERT .. ON CONFLICT`,
 *    staged `COPY` + server-side merge) slot in behind the same call.
 *
 * Scale notes: parallelism = DataFrame partitions, so `repartition(n)`
 * bounds the connection count; batches amortize round trips; each batch
 * is its own transaction so a retry replays one batch, not the job.
 * Callers should `repartition(keyCols)` first so a key is owned by ONE
 * partition (no cross-partition update/insert race) — the same
 * key-ownership contract the reference's per-destination queues give.
 */
object JdbcSink {

  /** Parallel append through Spark's native JDBC writer. */
  def append(df: DataFrame, url: String, table: String,
             options: Map[String, String] = Map.empty): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", table)
      .options(options)
      .mode("append").save()

  /** Batched two-phase upsert on `keyCols` (UPDATE batch, then INSERT
    * batch for the misses). Column order follows the frame. */
  def upsert(df: DataFrame, url: String, table: String, keyCols: Seq[String],
             batchSize: Int = 500): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), s"keyCols must be ⊆ $cols")
    val payload = cols.filterNot(keyCols.contains)
    require(payload.nonEmpty, "upsert needs at least one non-key column")
    val updateSql = s"UPDATE $table SET ${payload.map(c => s"$c = ?").mkString(", ")} " +
      s"WHERE ${keyCols.map(k => s"$k = ?").mkString(" AND ")}"
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val updateOrder = payload ++ keyCols

    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          rows.grouped(batchSize).foreach { batch =>
            batch.foreach { r =>
              updateOrder.zipWithIndex.foreach { case (c, i) =>
                upd.setObject(i + 1, r.get(r.fieldIndex(c)))
              }
              upd.addBatch()
            }
            val counts = upd.executeBatch()
            val misses = batch.zip(counts).collect { case (r, 0) => r }
            misses.foreach { r =>
              cols.zipWithIndex.foreach { case (c, i) =>
                ins.setObject(i + 1, r.get(r.fieldIndex(c)))
              }
              ins.addBatch()
            }
            if (misses.nonEmpty) ins.executeBatch()
            conn.commit()
          }
        } finally conn.close()
      }
    }
  }
}
