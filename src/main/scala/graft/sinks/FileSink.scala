package graft.sinks

import org.apache.spark.sql.DataFrame

/**
 * B12 — file-format sinks (the reference's `file` connector writes ndjson;
 * connectors/http supports json|ndjson|array bodies). Spark-side these are
 * just the built-in distributed writers — each executor writes its own
 * partition files, no driver funnel, which is the 100 TB-safe shape.
 */
object FileSink {

  /** ndjson: one JSON object per line (reference `file` connector format). */
  def ndjson(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    writer(df, overwrite).json(path)

  def csv(df: DataFrame, path: String, header: Boolean = true, overwrite: Boolean = true): Unit =
    writer(df, overwrite).option("header", header.toString).csv(path)

  def parquet(df: DataFrame, path: String, overwrite: Boolean = true): Unit =
    writer(df, overwrite).parquet(path)

  /** Snapshot write for sync bookkeeping: partitioned by sync so a later
    * diff prunes straight to one directory. */
  def snapshot(df: DataFrame, root: String, syncId: String, runId: String): String = {
    val path = s"$root/sync_id=$syncId/run_id=$runId"
    df.write.mode("overwrite").parquet(path)
    path
  }

  private def writer(df: DataFrame, overwrite: Boolean) =
    df.write.mode(if (overwrite) "overwrite" else "error")
}
