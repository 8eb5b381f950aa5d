package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q._

/**
 * §2D (batch equivalents) — windowed aggregation and sessionization over the
 * `events` table. The true Structured Streaming paths (readStream →
 * watermark → window → sink, streaming dedup, stateful sessionize) live in
 * graft.streaming.EventStreams; these batch twins compute identical answers
 * so the DuckDB oracle can check the semantics.
 *
 * `events.ts` is parquet TIMESTAMP(NANOS); both engines see it as epoch
 * nanoseconds (Spark via nanosAsLong, DuckDB via epoch_ns), so window and
 * gap arithmetic is exact integer math — no cross-engine timestamp rounding.
 */
object Events {

  private val WindowNs = 300L * 1000 * 1000 * 1000 // 5-minute tumbling window
  private val GapNs = 1800L * 1000 * 1000 * 1000   // 30-minute session gap

  /** D1: tumbling-window aggregation — 5-min windows × event_type. Maps 1:1
    * onto `groupBy(window($"ts", "5 minutes"), $"event_type")` in the
    * streaming path; partial aggregation keeps the shuffle tiny. */
  def q50WindowAgg(t: Tables): DataFrame =
    t.events
      // integer `div`, not `/`: epoch nanos exceed double's 2^53 exactness
      .groupBy((expr(s"ts div ${WindowNs}L") * WindowNs).as("window_start_ns"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           money(sum(dec(col("value")))).as("sum_value"))
      .orderBy("window_start_ns", "event_type")

  /** D20: top event PATHS — the length-3 sequence-mining extension of
    * the q99 transition matrix: the most common 3-step event sequences
    * across users (the "what do users actually do" path report). One
    * user-partitioned window pass with a total (ts, event_id) order
    * produces both lookaheads; the path count is a map-side-partial
    * groupBy on a bounded key space (|event types|³) and the ranking is
    * TakeOrderedAndProject. */
  def q124TopPaths(t: Tables): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    t.events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"), col("e3").as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1").asc, col("step2").asc, col("step3").asc)
      .limit(25)
  }

  /** D19: daily metric ANOMALY flags — the monitoring query a pipeline
    * pages on: per (day, event_type), the day's total value vs the
    * trailing-7-day mean and standard deviation, flagged when the
    * absolute z-score exceeds 2. Cross-engine exactness: daily totals
    * are DECIMAL sums (associative); the trailing stats come from exact
    * decimal power sums over the window (the q112 recipe) with ONE
    * double read-out both engines evaluate identically. The trailing
    * window runs over the PRE-AGGREGATED day frame — cardinality
    * #days × #types, bounded at any event volume (the q17 argument) —
    * partitioned by event_type.
    *
    * SEMANTICS, stated deliberately: the ROWS frame spans the trailing 7
    * OBSERVED days per event_type, not 7 calendar days — a zero-event
    * calendar day produces no row, stretches the lookback across the gap,
    * and is itself never flagged (the DuckDB oracle mirrors this exactly).
    * For calendar-true monitoring, densify onto a date spine first (the
    * q56/q80 gap-fill pattern) with zero totals, then run the same
    * window; observed-days is kept here because it is the form whose
    * cross-engine exactness is provable value-for-value. */
  def q120AnomalyFlags(t: Tables): DataFrame = {
    val DayNs = 86400L * 1000L * 1000L * 1000L
    val daily = t.events
      .groupBy(expr(s"ts div ${DayNs}L").as("day"), col("event_type"))
      .agg(sum(dec(col("value"))).cast(Q.Dec).as("sv")) // re-narrow: keeps sv*sv inside exact precision
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val stats = daily
      .withColumn("tn", count(lit(1)).over(w))
      .withColumn("ts1", sum(col("sv")).over(w))
      .withColumn("ts2", sum(col("sv") * col("sv")).over(w))
      .filter(col("tn") >= 3) // need history before judging a day
    stats.select(col("day"), col("event_type"), money(col("sv")).as("day_total"),
        (d(col("ts1")) / d(col("tn"))).as("trailing_mean"),
        sqrt((d(col("ts2")) - d(col("ts1")) * d(col("ts1")) / d(col("tn"))) /
          (d(col("tn")) - 1)).as("trailing_std"))
      .withColumn("z",
        (col("day_total") - col("trailing_mean")) / col("trailing_std"))
      .withColumn("anomaly", abs(col("z")) > 2.0)
      .orderBy("event_type", "day")
  }

  /** D2: sessionization — 30-min-gap sessions per user via gaps-and-islands:
    * a window-partitioned lag marks session starts, a running sum numbers
    * them, then one aggregation per (user, session). Same answer as the
    * flatMapGroupsWithState streaming sessionizer; all windows are
    * partitioned by user_id (no global ordering at scale). */
  def q51Sessionize(t: Tables): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    t.events
      // microsecond precision: DuckDB stores TIMESTAMP(NANOS) as µs, so the
      // cross-engine-comparable clock is `ts div 1000`
      .withColumn("ts_us", expr("ts div 1000L"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapNs / 1000, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts_us")).as("session_start_us"),
           max(col("ts_us")).as("session_end_us"),
           count(lit(1)).as("n_events"),
           money(sum(dec(col("value")))).as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  /** D5: as-of attribution — each purchase event gets the same user's most
    * recent STRICTLY-prior click (graft.operators.AsOf: one shuffle + one
    * window pass, no join blow-up). Clicks are pre-deduplicated per
    * (user, ts) so the answer is deterministic; DuckDB's native ASOF LEFT
    * JOIN is the oracle. */
  def q44AsofAttrib(t: Tables): DataFrame = {
    // µs clock on both sides (same convention as q51): DuckDB stores the
    // parquet TIMESTAMP(NANOS) as µs, so µs is the cross-engine-exact unit.
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us"), col("click_id"), col("ts_us").as("click_ts_us"))
    graft.operators.AsOf.joinPrior(purchases, clicks,
        keyCol = "user_id", leftTimeCol = "ts_us", rightTimeCol = "ts_us",
        rightValueCols = Seq("click_id", "click_ts_us"))
      .orderBy("event_id")
  }

  /** D21: FORWARD as-of — for each purchase, the next click strictly
    * after it (post-conversion behavior attribution; q44's direction
    * reversed). Same µs-clock convention; oracle = DuckDB ASOF with the
    * `<` comparator. */
  def q128AsofForward(t: Tables): DataFrame = {
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us"), col("click_id"), col("ts_us").as("click_ts_us"))
    graft.operators.AsOf.joinForward(purchases, clicks,
        keyCol = "user_id", leftTimeCol = "ts_us", rightTimeCol = "ts_us",
        rightValueCols = Seq("click_id", "click_ts_us"))
      .orderBy("event_id")
  }

  /** D21 (nearest): the NEAREST click around each purchase, ties to the
    * prior side — oracle composes DuckDB's two ASOF directions with the
    * same tie rule, pinning the mode's choice logic value-for-value. */
  def q129AsofNearest(t: Tables): DataFrame = {
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts_us", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts_us").agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts_us"), col("click_id"))
    graft.operators.AsOf.joinNearest(purchases, clicks,
        keyCol = "user_id", leftTimeCol = "ts_us", rightTimeCol = "ts_us",
        rightValueCols = Seq("click_id"))
      .orderBy("event_id")
  }

  /** D7: semi-structured extraction — filter + aggregate on a field inside
    * the JSON `props` payload. `get_json_object` is a per-row codegen'd
    * path expression; at 100 TB prefer parsing ONCE with `from_json` into
    * a struct column when several fields are read (single parse, columnar
    * downstream). */
  def q49JsonExtract(t: Tables): DataFrame =
    t.events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .filter(col("k") > 50)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
      .orderBy("event_type")

  /** D9: funnel analysis — users progressing view → click → purchase in
    * strict event-time order. Three per-user conditional-min aggregations,
    * each constrained by the previous stage's timestamp; every stage is a
    * partial-aggregated shuffle on user_id (the same key each time, so
    * AQE/exchange reuse keeps it one physical partitioning). */
  def q58Funnel(t: Tables): DataFrame = {
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
      .select("user_id", "event_type", "ts_us")
    val v = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts_us"))).as("t_view"))
    val c = ev.join(v, "user_id")
      .groupBy("user_id", "t_view")
      .agg(min(when(col("event_type") === "click" && col("ts_us") > col("t_view"),
        col("ts_us"))).as("t_click"))
    val p = ev.join(c, "user_id")
      .groupBy("user_id", "t_view", "t_click")
      .agg(min(when(col("event_type") === "purchase" && col("ts_us") > col("t_click"),
        col("ts_us"))).as("t_purchase"))
    p.agg(
      count(when(col("t_view").isNotNull, 1)).as("n_view"),
      count(when(col("t_click").isNotNull, 1)).as("n_view_click"),
      count(when(col("t_purchase").isNotNull, 1)).as("n_view_click_purchase"))
  }

  /** D10: weekly retention cohorts — users bucketed by first-active week,
    * counted per week offset. Distinct (user, week) first, so the cohort
    * grid aggregates bounded input regardless of per-user event volume. */
  def q59Retention(t: Tables): DataFrame = {
    val WeekUs = 604800000000L
    val uw = t.events
      .select(col("user_id"), expr(s"(ts div 1000L) div ${WeekUs}L").as("week"))
      .distinct()
    val cohort = uw.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** D6: range join — events counted into overlapping 90-minute campaign
    * windows (hourly starts over the whole month), via the binned
    * equi-join in graft.operators.RangeJoin (NOT the
    * BroadcastNestedLoopJoin Spark would plan for a raw inequality join).
    * Window grid is deterministic so DuckDB reproduces it exactly. */
  def q48RangeJoin(t: Tables): DataFrame = {
    val spark = t.events.sparkSession
    val BaseUs = 1704067200000000L       // 2024-01-01T00:00:00Z in epoch µs
    val StepUs = 3600L * 1000 * 1000     // hourly starts
    val LenUs  = 5400L * 1000 * 1000     // 90-minute windows (overlapping)
    val intervals = spark.range(0, 720).select(
      col("id").as("interval_id"),
      (lit(BaseUs) + col("id") * StepUs).as("start_us"),
      (lit(BaseUs) + col("id") * StepUs + LenUs).as("end_us"))
    val ev = t.events.select(expr("ts div 1000L").as("ts_us"), col("value"))
    graft.operators.RangeJoin
      .pointInInterval(ev, intervals, "ts_us", "start_us", "end_us", binSize = StepUs)
      .groupBy("interval_id")
      .agg(count(lit(1)).as("n_events"), money(sum(dec(col("value")))).as("sum_value"))
      .orderBy("interval_id")
  }

  /** D15: event TRANSITION matrix (next-event Markov counts) — for each
    * user's event-time-ordered stream, count (from → to) adjacent-event
    * transitions and the per-from probability; the path-analysis /
    * "what happens after a click" shape.
    *
    * Scale: ONE window pass partitioned by user (high cardinality; ties
    * broken by event_id so both engines see the same total order), then a
    * bounded-key groupBy (|event types|²) with map-side partials. The
    * probability divides two exact longs — same double on any engine. */
  def q99Transitions(t: Tables): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    val pairs = t.events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("n_from")).as("prob"))
      .orderBy("from_type", "to_type")
  }

  /** The q51 sessions reduced to their (user, seq, start, end) intervals —
    * shared by A38's sweep-line and D26's streaming twin. */
  private[graft] def sessionIntervals(t: Tables): DataFrame =
    sessionIntervalsFrom(t.events)

  private[graft] def sessionIntervalsFrom(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    events
      .withColumn("ts_us", expr("ts div 1000L"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapNs / 1000, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }

  /** A38: interval sweep-line — peak concurrent sessions per day, the
    * classic "how many intervals overlap at time t" workload (meeting-room /
    * active-session counting) that a correlated COUNT(*) range predicate
    * would turn into an O(N²) join. Each q51 session contributes +1 at its
    * start and −1 just past its end (half-open [start, end+1µs)); the global
    * time-ordered running sum comes from graft.operators.Sweep — per-day
    * local windows plus broadcast cumulated day carry-ins, never one global
    * window task. Ties at one instant are ordered (delta ASC, user, seq) on
    * both engines: closes apply before opens, so back-to-back sessions never
    * double-count. A day's peak is the max over boundary instants within it
    * (the stated contract — a boundary-free day inherits no row). */
  def q158Concurrency(t: Tables): DataFrame = {
    val DayUs = 86400000000L
    val s = sessionIntervals(t)
    val bounds = s.select(col("user_id"), col("session_seq"),
        col("start_us").as("t_us"), lit(1L).as("delta"))
      .unionByName(s.select(col("user_id"), col("session_seq"),
        (col("end_us") + 1).as("t_us"), lit(-1L).as("delta")))
    graft.operators.Sweep.runningSum(bounds, expr(s"t_us div ${DayUs}L"),
        Seq("t_us", "delta", "user_id", "session_seq"), "delta")
      .withColumn("day", expr(s"t_us div ${DayUs}L"))
      .groupBy("day")
      .agg(max(col("running")).as("peak_concurrency"),
           sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_starts"),
           sum(when(col("delta") === -1L, 1L).otherwise(0L)).as("n_ends"))
      .orderBy("day")
  }

  /** A39: gaps-and-islands — per-user streaks of consecutive ACTIVE DAYS,
    * the canonical `day − row_number()` island anchor: distinct activity
    * days per user, islands by the constant anchor, then one bounded
    * per-user pass for the summary (longest streak ties break to the
    * earliest start). Per-user windows are fine at any corpus scale — the
    * frame is that user's distinct days, not the table. */
  def q159Streaks(t: Tables): DataFrame = {
    val DayUs = 86400000000L
    val days = t.events
      .select(col("user_id"), expr(s"(ts div 1000L) div ${DayUs}L").as("day"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy(col("day").asc)
    val islands = days
      .withColumn("anchor", col("day") - row_number().over(w))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    val best = Window.partitionBy("user_id").orderBy(col("len").desc, col("start_day").asc)
    islands.withColumn("rn", row_number().over(best))
      .groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
           count(lit(1)).as("n_streaks"),
           max(col("len")).as("longest_streak"),
           min(when(col("rn") === 1, col("start_day"))).as("longest_start_day"))
      .orderBy("user_id")
  }

  /** C146: sequential association rules
    * ([[graft.operators.Associations.sequenceRules]]) — "a, THEN b"
    * within 30-min sessions (the q51 session kernel), counted once per
    * session via the min/max-timestamp containment test (never an
    * event-pair join). Direction matters; exact ppm/per-mille
    * integers; top-20 under a total order. */
  def q227SequenceRules(t: Tables): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us").asc, col("event_id").asc)
    val sessioned = t.events
      .withColumn("ts_us", expr("ts div 1000L"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapNs / 1000, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(concat(col("user_id").cast("string"), lit(":"),
          col("session_seq").cast("string")).as("session"),
        col("event_type"), col("ts_us"))
    graft.operators.Associations.sequenceRules(sessioned, "session",
        "event_type", "ts_us", minSupport = 3L)
      .orderBy(col("lift_pm").desc, col("conf_ppm").desc,
        col("antecedent").asc, col("consequent").asc)
      .limit(20)
  }

  /** C148: Holt linear-trend smoothing
    * ([[graft.operators.Smoothing.holt]], α = 0.2, β = 0.1) over daily
    * event counts per type — the trend-following forecast whose error
    * column is the drift alarm a plain EWMA lags on. Same fixed-point
    * fold discipline as q225; the oracle replays both carried scalars
    * through a recursive CTE. */
  def q230Holt(t: Tables): DataFrame = {
    val DayNs = 86400L * 1000L * 1000L * 1000L
    val daily = t.events
      .groupBy(col("event_type"), expr(s"ts div ${DayNs}L").as("day"))
      .agg(count(lit(1)).as("v"))
    graft.operators.Smoothing.holt(daily, col("event_type"), col("day"),
        col("v"), aNum = 2L, aDen = 10L, bNum = 1L, bDen = 10L)
      .orderBy("series", "t")
  }

  /** C144: per-type EWMA of daily event value
    * ([[graft.operators.Smoothing.ewma]], α = 1/4) — the running level
    * estimate + one-step-ahead forecast error a monitor pages on.
    * Daily cents are exact decimal sums; the smoothing walk is the
    * fixed-point truncating fold both engines replay step-for-step
    * (the oracle is a recursive CTE). */
  def q225Ewma(t: Tables): DataFrame = {
    val DayNs = 86400L * 1000L * 1000L * 1000L
    val daily = t.events
      .groupBy(col("event_type"), expr(s"ts div ${DayNs}L").as("day"))
      .agg((sum(dec(col("value"))) * 100).cast("long").as("v"))
    graft.operators.Smoothing.ewma(daily, col("event_type"), col("day"),
        col("v"), aNum = 1L, aDen = 4L)
      .orderBy("series", "t")
  }

  /** C145: lead-lag cross-correlation
    * ([[graft.operators.Smoothing.leadLagCorr]]) between daily click and
    * purchase counts at lags −7..7 — "does click volume lead purchase
    * volume, and by how many days". Exact integer power sums per lag,
    * one mirrored double corr read-out (the A33/q112 recipe). */
  def q226LeadLag(t: Tables): DataFrame = {
    val DayNs = 86400L * 1000L * 1000L * 1000L
    def daily(et: String, out: String) = t.events
      .filter(col("event_type") === et)
      .groupBy(expr(s"ts div ${DayNs}L").as("t"))
      .agg(count(lit(1)).as(out))
    graft.operators.Smoothing.leadLagCorr(
        daily("click", "x"), daily("purchase", "y"), maxLag = 7)
      .select(col("lag"), col("n"), col("sx"), col("sy"),
        col("sxy").cast("long").as("sxy"), col("sxx").cast("long").as("sxx"),
        col("syy").cast("long").as("syy"), col("corr"))
      .orderBy("lag")
  }
}
