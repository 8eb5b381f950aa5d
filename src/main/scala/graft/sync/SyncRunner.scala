package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Model
import graft.operators.Diff
import graft.state.StateStore

/**
 * B14 — the full sync pipeline: model → cursor filter → validate →
 * column-map → sink, with cursor checkpointing in the state store.
 *
 * Reference flow: core/src/commands/sync.ts:553-616 — read rows past the
 * persisted cursor, assert monotone order, validate each row against the
 * error threshold, enrich, push to the destination in batches, persist
 * max(cursor). Row-at-a-time there; one declarative plan per run here:
 * the cursor predicate reaches the source scan, validation is a codegen'd
 * projection, and the max-cursor checkpoint is a partial aggregation —
 * nothing funnels through the driver except the final counts.
 */
final class SyncRunner(store: StateStore, threshold: ErrorThreshold = ErrorThreshold()) {

  private def cursorKey(syncId: String) = Seq(s"syncId=$syncId", "$lastCursor")

  final case class SyncReport(
      syncId: String, rowsIn: Long, rowsValid: Long, rowsInvalid: Long,
      newCursor: Option[String], incremental: Boolean)

  /** One sync run. `sink` receives the validated, mapped rows. */
  def run(spark: SparkSession, model: Model, syncId: String,
          sink: DataFrame => Unit, fullRefresh: Boolean = false): SyncReport = {
    // 1. incremental cursor (reference: `:cursor` substitution) — SQL-text
    // models bind the value INTO their query as a typed parameter;
    // DataFrame models get a cursorCol predicate (both reach the scan).
    val lastCursor = if (fullRefresh) None else store.get(cursorKey(syncId))
    val increment = (model.buildIncremental, model.cursorCol, lastCursor) match {
      case (Some(bi), _, Some(v)) => bi(spark, v)
      case (None, Some(c), Some(v)) =>
        val base = model.build(spark)
        base.filter(col(c) > lit(v).cast(base.schema(c).dataType))
      case _ => model.build(spark)
    }

    // 2. validation — one flag column; all rules codegen'd per row
    val rules = model.validations
    val flagged =
      if (rules.isEmpty) increment.withColumn("__valid", lit(true))
      else increment.withColumn("__valid", rules.map(_._2(increment)).reduce(_ && _))

    // 3. single aggregation for counts + max cursor (one job, partial aggs)
    val aggCols = Seq(
      count(lit(1)).as("n"),
      count(when(col("__valid"), 1)).as("n_valid")) ++
      model.cursorCol.map(c => max(when(col("__valid"), col(c))).cast("string").as("max_cursor"))
    val stats = flagged.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    val n = stats.getAs[Long]("n")
    val nValid = stats.getAs[Long]("n_valid")
    val nInvalid = n - nValid

    // 4. error-threshold gate BEFORE any rows reach the destination
    threshold.check(nValid, nInvalid)

    // 5. column mapping to the destination schema, then sink valid rows
    val valid = flagged.filter(col("__valid")).drop("__valid")
    val mapped = model.columnMap match {
      case Some(m) => valid.select(m.map { case (name, e) => e(valid).as(name) }: _*)
      case None    => valid
    }
    sink(mapped)

    // 6. checkpoint max(cursor) — only after a successful sink
    val newCursor = model.cursorCol.flatMap(_ => Option(stats.getAs[String]("max_cursor")))
      .orElse(lastCursor)
    newCursor.foreach(v => store.set(cursorKey(syncId), v))

    SyncReport(syncId, n, nValid, nInvalid, newCursor, lastCursor.isDefined)
  }

  /** CDC run: diff the model's current output against the previous
    * snapshot, sink only changes, write the new snapshot. The snapshot
    * lives as parquet (bucketable at scale), NOT in the KV store. */
  def runDiff(spark: SparkSession, model: Model, syncId: String, snapshotRoot: String,
              sink: DataFrame => Unit): String = {
    val curr = model.build(spark)
    val prevPath = store.get(Seq(s"syncId=$syncId", "$snapshot"))
    val changes = prevPath match {
      case Some(p) => Diff.snapshotDiff(curr, spark.read.parquet(p), model.keyCols)
      case None    => curr.withColumn(Diff.ChangeCol, lit("insert"))
    }
    sink(changes)
    // monotone run counter → every run writes a FRESH snapshot path; the
    // previous snapshot must stay intact while `changes` is still lazily
    // consumable by the caller.
    val runId = store.get(Seq(s"syncId=$syncId", "$runSeq")).map(_.toLong).getOrElse(0L) + 1
    store.set(Seq(s"syncId=$syncId", "$runSeq"), runId.toString)
    val newPath = s"$snapshotRoot/sync_id=$syncId/run_id=$runId"
    curr.write.mode("overwrite").parquet(newPath)
    store.set(Seq(s"syncId=$syncId", "$snapshot"), newPath)
    newPath
  }
}
