package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/**
 * §2D — Structured Streaming over the events shape: readStream → watermark
 * → windowed agg / dedup / stateful sessionization → sink.
 *
 * The batch twins (queries.Events q50/q51) compute identical answers and
 * carry the DuckDB oracle; these are the true incremental paths. State is
 * bounded by watermarks everywhere — at production scale that is what keeps
 * the state store from growing without limit.
 */
object EventStreams {

  /** Streaming source over a directory of parquet/json event files with an
    * explicit schema (no inference — schema drift must be a deliberate act,
    * and inference would read data on the driver). */
  def readEvents(spark: SparkSession, dir: String, format: String = "parquet"): DataFrame =
    spark.readStream
      .format(format)
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE")
      .load(dir)

  /** D3 core: watermarked 5-minute tumbling-window aggregation. */
  def windowedAgg(events: DataFrame, watermark: String = "10 minutes",
                  windowLen: String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** D4: streaming exact dedup on event_id, state bounded by the watermark
    * (an id can only repeat within the lateness horizon). */
  def dedup(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicates("event_id")

  // --- stateful sessionization ----------------------------------------

  final case class SessionState(start: Long, end: Long, n: Long, sum: Double)
  final case class SessionOut(user_id: Long, session_start_ms: Long, session_end_ms: Long,
                              n_events: Long, sum_value: Double)

  /** D2 (true streaming form): 30-minute-gap sessions per user via
    * flatMapGroupsWithState with a processing-time-free, event-time-driven
    * timeout. Emits a session when the gap passes or the watermark moves
    * beyond it. */
  def sessionize(events: DataFrame, gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "30 minutes"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp], col("value").as[Double])
      .as[(Long, Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp, Double)], state: GroupState[SessionState]) =>
          val sorted = rows.map(r => (r._2.getTime, r._3)).toSeq.sortBy(_._1)
          var sessions = List.empty[SessionOut]
          var cur = state.getOption
          if (state.hasTimedOut) {
            val out = cur.map(s => SessionOut(user, s.start, s.end, s.n, s.sum)).toList
            state.remove()
            out.iterator
          } else {
            sorted.foreach { case (t, v) =>
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.sum + v))
                case Some(s) =>
                  sessions ::= SessionOut(user, s.start, s.end, s.n, s.sum)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            sessions.reverse.iterator
          }
      }.toDF()
  }

  // --- streaming funnel / retention (D9/D10 true-streaming twins) -------

  final case class FunnelState(tView: Long, tClick: Long, tPurchase: Long, lastTs: Long)
  final case class FunnelOut(user_id: Long, t_view: Option[Long], t_click: Option[Long],
                             t_purchase: Option[Long])

  /** D9 (true streaming form): per-user view → click → purchase progress
    * via flatMapGroupsWithState. Events fold in event-time order with the
    * strict-ordering constraint q58 applies (a stage only counts after the
    * previous stage's FIRST time), so on a closed input the emitted rows
    * aggregate to exactly the batch funnel. A user's funnel flushes once
    * the watermark passes `quietMs` past their last event — per-user state
    * is three longs, and the timeout bounds its lifetime. */
  def funnelStages(events: DataFrame, watermark: String = "30 minutes",
                   quietMs: Long = 30 * 60 * 1000L): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val U = -1L // unset
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp], col("event_type").as[String])
      .as[(Long, Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp, String)], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            def opt(v: Long) = if (v == U) None else Some(v)
            Iterator.single(FunnelOut(user, opt(s.tView), opt(s.tClick), opt(s.tPurchase)))
          } else {
            var s = state.getOption.getOrElse(FunnelState(U, U, U, 0L))
            rows.map(r => (r._2.getTime, r._3)).toSeq.sortBy(_._1).foreach { case (t, kind) =>
              s = kind match {
                case "view"     if s.tView == U                     => s.copy(tView = t)
                case "click"    if s.tClick == U && s.tView != U  && t > s.tView  => s.copy(tClick = t)
                case "purchase" if s.tPurchase == U && s.tClick != U && t > s.tClick => s.copy(tPurchase = t)
                case _ => s
              }
              s = s.copy(lastTs = math.max(s.lastTs, t))
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastTs + quietMs)
            Iterator.empty
          }
      }.toDF()
  }

  final case class RetentionState(firstWeek: Long, seen: Set[Long])
  final case class RetentionOut(user_id: Long, cohort_week: Long, week_offset: Long)

  /** D10 (true streaming form): emits ONE (user, cohort_week, week_offset)
    * increment per newly-seen (user, week) — `groupBy(cohort_week,
    * week_offset).count` over the output reproduces the batch retention
    * grid incrementally. State per user: first-active week + the set of
    * seen weeks, pruned below the event-time frontier minus one week
    * (the watermark already drops older arrivals), so state stays a
    * handful of longs no matter how long the stream runs. */
  def retentionUpdates(events: DataFrame, watermark: String = "1 day"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val WeekMs = 604800000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").as[Long], col("ts").as[Timestamp])
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[RetentionState, RetentionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[RetentionState]) =>
          val weeks = rows.map(_._2.getTime / WeekMs).toSeq.sorted
          var s = state.getOption.getOrElse(RetentionState(Long.MaxValue, Set.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[RetentionOut]
          weeks.foreach { w =>
            if (w < s.firstWeek) s = s.copy(firstWeek = w)
            if (!s.seen.contains(w)) {
              s = s.copy(seen = s.seen + w)
              out += RetentionOut(user, s.firstWeek, w - s.firstWeek)
            }
          }
          if (s.seen.nonEmpty) {
            val frontier = s.seen.max - 1 // watermark horizon: older weeks can't recur
            state.update(s.copy(seen = s.seen.filter(_ >= frontier)))
          }
          out.iterator
      }.toDF()
  }

  /** D11: watermarked stream-stream join — attribute each conversion to
    * the impressions of the same user within `horizon` before it (the
    * canonical ad-attribution shape). The event-time range condition +
    * both-side watermarks BOUND the join state: Spark evicts buffered
    * rows once the other side's watermark passes their horizon — without
    * the range bound, stream-stream join state grows forever. Inner join,
    * so results emit as soon as both sides arrive. */
  def attributionJoin(impressions: DataFrame, conversions: DataFrame,
                      horizon: String = "30 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    val imp = impressions
      .select(col("user_id").as("i_user"), col("ts").as("i_ts"),
              col("event_id").as("impression_id"))
      .withWatermark("i_ts", watermark)
    val conv = conversions
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("conversion_id"), col("value"))
      .withWatermark("c_ts", watermark)
    imp.join(conv, expr(
        s"i_user = c_user AND c_ts >= i_ts AND c_ts <= i_ts + interval $horizon"))
      .select(col("i_user").as("user_id"), col("impression_id"), col("conversion_id"),
              col("i_ts"), col("c_ts"), col("value"))
  }

  /** D3 end-to-end: stream a directory into a windowed-agg parquet sink and
    * block until all currently-available input is processed (AvailableNow —
    * the batch-boundary trigger used for backfills). */
  def runWindowedAggToParquet(spark: SparkSession, inDir: String, outDir: String,
                              checkpointDir: String): Unit = {
    val q = windowedAgg(readEvents(spark, inDir))
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** D8: streaming reverse-ETL — any stream into any graft batch sink
    * (RestSink / JdbcSink / Payloads shapers) via foreachBatch: each
    * micro-batch is an ordinary DataFrame, so the WHOLE batch sink
    * library applies unchanged, with exactly-once bookkeeping from the
    * checkpoint + the sink's idempotence (upserts/audience diffs are
    * idempotent by construction; batchId lets non-idempotent sinks
    * dedupe). This is how a production continuous sync runs: the batch
    * SyncRunner semantics, incrementally. */
  def runToSink(transformed: DataFrame, checkpointDir: String)
               (sink: (DataFrame, Long) => Unit): Unit = {
    val q = transformed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(batch.toDF(), batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
