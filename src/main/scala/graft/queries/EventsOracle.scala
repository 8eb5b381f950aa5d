package graft.queries

/** DuckDB oracle SQL for §2D batch equivalents. DuckDB reads events.ts as
  * TIMESTAMP(NANOS); epoch_ns() recovers the same integers Spark sees via
  * nanosAsLong. */
object EventsOracle {
  val sql: Map[String, String] = Map(
    "q44_asof_attrib" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |       c.click_id AS asof_click_id, c.ts_us AS asof_click_ts_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts_us > c.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q128_asof_forward" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |       c.click_id AS asof_click_id, c.ts_us AS asof_click_ts_us
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts_us < c.ts_us
        |ORDER BY p.event_id""".stripMargin,

    "q129_asof_nearest" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
        |  FROM events WHERE event_type = 'purchase'
        |), clicks AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
        |), pr AS (
        |  SELECT p.event_id, c.click_id, c.ts_us AS cts
        |  FROM purchases p ASOF LEFT JOIN clicks c
        |    ON p.user_id = c.user_id AND p.ts_us > c.ts_us
        |), fw AS (
        |  SELECT p.event_id, c.click_id, c.ts_us AS cts
        |  FROM purchases p ASOF LEFT JOIN clicks c
        |    ON p.user_id = c.user_id AND p.ts_us < c.ts_us
        |)
        |SELECT p.event_id, p.user_id, p.ts_us, p.value,
        |  CASE WHEN fw.cts IS NULL OR (pr.cts IS NOT NULL
        |            AND (p.ts_us - pr.cts) <= (fw.cts - p.ts_us))
        |       THEN pr.click_id ELSE fw.click_id END AS asof_click_id,
        |  CASE WHEN fw.cts IS NULL OR (pr.cts IS NOT NULL
        |            AND (p.ts_us - pr.cts) <= (fw.cts - p.ts_us))
        |       THEN pr.cts ELSE fw.cts END AS asof_ts_us
        |FROM purchases p JOIN pr USING (event_id) JOIN fw USING (event_id)
        |ORDER BY p.event_id""".stripMargin,

    "q48_range_join" ->
      """WITH iv AS (
        |  SELECT i AS interval_id,
        |         1704067200000000 + i * 3600000000 AS start_us,
        |         1704067200000000 + i * 3600000000 + 5400000000 AS end_us
        |  FROM range(720) t(i)
        |), ev AS (
        |  SELECT epoch_us(ts) AS ts_us, value FROM events
        |)
        |SELECT interval_id, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM ev JOIN iv ON ts_us >= start_us AND ts_us < end_us
        |GROUP BY interval_id ORDER BY interval_id""".stripMargin,

    "q49_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events
        |WHERE CAST(props->>'k' AS BIGINT) > 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q58_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        |), v AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN ts_us END) AS t_view
        |  FROM ev GROUP BY user_id
        |), c AS (
        |  SELECT ev.user_id, v.t_view,
        |         min(CASE WHEN event_type = 'click' AND ts_us > v.t_view THEN ts_us END) AS t_click
        |  FROM ev JOIN v USING (user_id) GROUP BY ev.user_id, v.t_view
        |), p AS (
        |  SELECT ev.user_id, c.t_view, c.t_click,
        |         min(CASE WHEN event_type = 'purchase' AND ts_us > c.t_click THEN ts_us END) AS t_purchase
        |  FROM ev JOIN c USING (user_id) GROUP BY ev.user_id, c.t_view, c.t_click
        |)
        |SELECT COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
        |       COUNT(CASE WHEN t_click IS NOT NULL THEN 1 END) AS n_view_click,
        |       COUNT(CASE WHEN t_purchase IS NOT NULL THEN 1 END) AS n_view_click_purchase
        |FROM p""".stripMargin,

    "q59_retention" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week FROM events
        |), cohort AS (
        |  SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id
        |)
        |SELECT c.cohort_week, uw.week - c.cohort_week AS week_offset,
        |       COUNT(*) AS n_users
        |FROM uw JOIN cohort c USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q50_window_agg" ->
      """SELECT (epoch_ns(ts) // 300000000000) * 300000000000 AS window_start_ns,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY window_start_ns, event_type""".stripMargin,

    "q51_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
        |), numbered AS (
        |  SELECT user_id, ts_us, event_id, value,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged
        |)
        |SELECT user_id, session_seq,
        |  min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM numbered
        |GROUP BY user_id, session_seq
        |ORDER BY user_id, session_seq""".stripMargin,

    // D15: next-event transitions — same per-user total order (ts, event_id),
    // bounded (from, to) counts, exact long/long probability.
    "q99_transitions" ->
      """WITH pairs AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY epoch_ns(ts) ASC, event_id ASC) AS to_type
        |  FROM events),
        |cnt AS (
        |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pairs WHERE to_type IS NOT NULL
        |  GROUP BY from_type, to_type),
        |tot AS (
        |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM cnt GROUP BY from_type)
        |SELECT c.from_type, c.to_type, c.n,
        |       CAST(c.n AS DOUBLE) / t.n_from AS prob
        |FROM cnt c JOIN tot t USING (from_type)
        |ORDER BY c.from_type, c.to_type""".stripMargin,

    // D20: top paths — two leads over the same total per-user order.
    "q124_top_paths" ->
      """WITH seq AS (
        |  SELECT event_type AS step1,
        |         lead(event_type, 1) OVER w AS step2,
        |         lead(event_type, 2) OVER w AS step3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) ASC, event_id ASC))
        |SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
        |FROM seq WHERE step3 IS NOT NULL
        |GROUP BY step1, step2, step3
        |ORDER BY n DESC, step1 ASC, step2 ASC, step3 ASC
        |LIMIT 25""".stripMargin,

    // D19: anomaly flags — decimal daily totals + decimal power sums over
    // the trailing window, identical double read-out composition.
    "q120_anomaly_flags" ->
      """WITH daily AS (
        |  SELECT CAST(epoch_ns(ts) // 86400000000000 AS BIGINT) AS day, event_type,
        |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sv
        |  FROM events GROUP BY 1, 2),
        |s AS (
        |  SELECT day, event_type, sv,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS tn,
        |    SUM(sv) OVER w AS ts1,
        |    SUM(sv * sv) OVER w AS ts2
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |r AS (
        |  SELECT day, event_type, CAST(sv AS DOUBLE) AS day_total,
        |    CAST(ts1 AS DOUBLE) / CAST(tn AS DOUBLE) AS trailing_mean,
        |    sqrt((CAST(ts2 AS DOUBLE) - CAST(ts1 AS DOUBLE) * CAST(ts1 AS DOUBLE)
        |            / CAST(tn AS DOUBLE)) / (CAST(tn AS DOUBLE) - 1)) AS trailing_std
        |  FROM s WHERE tn >= 3)
        |SELECT day, event_type, day_total, trailing_mean, trailing_std,
        |  (day_total - trailing_mean) / trailing_std AS z,
        |  abs((day_total - trailing_mean) / trailing_std) > 2.0 AS anomaly
        |FROM r ORDER BY event_type, day""".stripMargin,

    // A38: sweep-line concurrency — the same session intervals as q51, one
    // running SUM over the deterministic (t, delta, user, seq) total order
    // (closes before opens at an instant; end+1 makes intervals half-open),
    // per-day peak over the boundary instants.
    "q158_concurrency" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)
        |), numbered AS (
        |  SELECT user_id, ts_us,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged
        |), se AS (
        |  SELECT user_id, session_seq, min(ts_us) AS start_us, max(ts_us) AS end_us
        |  FROM numbered GROUP BY user_id, session_seq
        |), b AS (
        |  SELECT user_id, session_seq, start_us AS t_us, CAST(1 AS BIGINT) AS delta FROM se
        |  UNION ALL
        |  SELECT user_id, session_seq, end_us + 1, CAST(-1 AS BIGINT) FROM se
        |), r AS (
        |  SELECT t_us // 86400000000 AS day, delta,
        |    SUM(delta) OVER (ORDER BY t_us ASC, delta ASC, user_id ASC, session_seq ASC
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        |  FROM b)
        |SELECT day, CAST(MAX(running) AS BIGINT) AS peak_concurrency,
        |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |  CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends
        |FROM r GROUP BY day ORDER BY day""".stripMargin,

    // A39: gaps-and-islands — the day − row_number() anchor; longest-streak
    // ties break to the earliest start on both engines.
    "q159_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
        |), isl AS (
        |  SELECT user_id,
        |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day ASC) AS BIGINT) AS anchor,
        |    day
        |  FROM days
        |), islands AS (
        |  SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len, min(day) AS start_day
        |  FROM isl GROUP BY user_id, anchor
        |), ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY len DESC, start_day ASC) AS rn
        |  FROM islands)
        |SELECT user_id,
        |  CAST(SUM(len) AS BIGINT) AS n_active_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
        |  CAST(MAX(len) AS BIGINT) AS longest_streak,
        |  MIN(CASE WHEN rn = 1 THEN start_day END) AS longest_start_day
        |FROM ranked GROUP BY user_id ORDER BY user_id""".stripMargin,

    // C144: per-type EWMA — the fixed-point truncating walk replayed
    // step-for-step via a recursive CTE (no closed form exists under
    // per-step truncation); cents are exact decimal sums, // on
    // non-negative BIGINTs matches Spark div.
    "q225_ewma" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
        |  SELECT event_type AS series, epoch_ns(ts) // 86400000000000 AS t,
        |         (SUM(CAST(value AS DECIMAL(18,2))) * 100)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |ser AS MATERIALIZED (
        |  SELECT series, t, v,
        |         row_number() OVER (PARTITION BY series ORDER BY t)::BIGINT AS rn
        |  FROM daily),
        |walk AS (
        |  SELECT series, t, rn, v, v * 1000 AS sm, CAST(NULL AS BIGINT) AS fc
        |  FROM ser WHERE rn = 1
        |  UNION ALL
        |  SELECT s.series, s.t, s.rn, s.v,
        |         (1 * s.v * 1000 + 3 * w.sm) // 4 AS sm, w.sm AS fc
        |  FROM ser s JOIN walk w ON s.series = w.series AND s.rn = w.rn + 1)
        |SELECT series, t, v, sm, fc, v * 1000 - fc AS err
        |FROM walk ORDER BY series, t""".stripMargin,

    // C148: Holt linear trend — the two-carried-scalar recursive CTE
    // (level duplicated inside the trend update exactly as the Spark
    // HOF repeats it; BIGINT // truncates toward zero like Spark div,
    // verified incl. negatives).
    "q230_holt" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
        |  SELECT event_type AS series, epoch_ns(ts) // 86400000000000 AS t,
        |         COUNT(*)::BIGINT AS v
        |  FROM events GROUP BY 1, 2),
        |ser AS MATERIALIZED (
        |  SELECT series, t, v,
        |         row_number() OVER (PARTITION BY series ORDER BY t)::BIGINT AS rn
        |  FROM daily),
        |walk AS (
        |  SELECT series, t, rn, v, v * 1000 AS l, 0::BIGINT AS tr,
        |         CAST(NULL AS BIGINT) AS fc
        |  FROM ser WHERE rn = 1
        |  UNION ALL
        |  SELECT s.series, s.t, s.rn, s.v,
        |    (2 * s.v * 1000 + 8 * (w.l + w.tr)) // 10 AS l,
        |    (1 * ((2 * s.v * 1000 + 8 * (w.l + w.tr)) // 10 - w.l) + 9 * w.tr) // 10 AS tr,
        |    w.l + w.tr AS fc
        |  FROM ser s JOIN walk w ON s.series = w.series AND s.rn = w.rn + 1)
        |SELECT series, t, v, l AS level, tr AS trend, fc, v * 1000 - fc AS err
        |FROM walk ORDER BY series, t""".stripMargin,

    // C146: sequential rules — the q51 session kernel, (session, item)
    // min/max timestamps, the strict a-before-b containment test,
    // apriori-pruned, exact ppm/per-mille arithmetic.
    "q227_seq_rules" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR ts_us - prev_ts > 1800000000
        |                 THEN 1 ELSE 0 END AS new_s
        |  FROM (SELECT *, lag(ts_us) OVER (PARTITION BY user_id
        |                     ORDER BY ts_us, event_id) AS prev_ts FROM e)),
        |s AS (
        |  SELECT user_id, event_type, ts_us,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                     ROWS UNBOUNDED PRECEDING) AS seq
        |  FROM m),
        |si0 AS MATERIALIZED (
        |  SELECT user_id::VARCHAR || ':' || seq::VARCHAR AS session,
        |         event_type AS item, MIN(ts_us) AS t_min, MAX(ts_us) AS t_max
        |  FROM s GROUP BY 1, 2),
        |ssz AS MATERIALIZED (SELECT session, COUNT(*)::BIGINT AS sz FROM si0 GROUP BY 1),
        |led AS (
        |  SELECT COALESCE(SUM(CASE WHEN sz > 1024 THEN 1 ELSE 0 END), 0)::BIGINT
        |           AS n_sessions_capped,
        |         CAST(COALESCE(SUM(CASE WHEN sz > 1024
        |           THEN sz::HUGEINT * (sz - 1) END), 0) AS BIGINT) AS n_pairs_dropped
        |  FROM ssz),
        |si AS MATERIALIZED (
        |  SELECT si0.* FROM si0 JOIN ssz USING (session) WHERE ssz.sz <= 1024),
        |nt AS (SELECT COUNT(DISTINCT session)::BIGINT AS n_sessions FROM si),
        |ic AS (SELECT item, COUNT(*)::BIGINT AS cnt FROM si GROUP BY 1),
        |freq AS (SELECT * FROM ic WHERE cnt >= 3),
        |fs AS (SELECT si.* FROM si SEMI JOIN freq ON si.item = freq.item),
        |pairs AS (
        |  SELECT a.item AS antecedent, b.item AS consequent, COUNT(*)::BIGINT AS pair_n
        |  FROM fs a JOIN fs b ON a.session = b.session AND a.item <> b.item
        |                     AND a.t_min < b.t_max
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        |SELECT antecedent, consequent, pair_n, fa.cnt AS ante_n, fc.cnt AS cons_n,
        |  1000000 * pair_n // nt.n_sessions AS support_ppm,
        |  1000000 * pair_n // fa.cnt AS conf_ppm,
        |  (1000::HUGEINT * pair_n * nt.n_sessions // (fa.cnt::HUGEINT * fc.cnt))::BIGINT AS lift_pm,
        |  led.n_sessions_capped, led.n_pairs_dropped
        |FROM pairs
        |JOIN freq fa ON fa.item = antecedent
        |JOIN freq fc ON fc.item = consequent, nt, led
        |ORDER BY lift_pm DESC, conf_ppm DESC, antecedent, consequent
        |LIMIT 20""".stripMargin,

    // C145: lead-lag cross-correlation — day-count series, per-lag exact
    // integer power sums, single mirrored double corr.
    "q226_lead_lag" ->
      """WITH xs AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS t, COUNT(*)::BIGINT AS x
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |ys AS (
        |  SELECT epoch_ns(ts) // 86400000000000 AS t, COUNT(*)::BIGINT AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |lags AS (SELECT unnest(range(-7, 8))::BIGINT AS lag),
        |ag AS (
        |  SELECT lag, COUNT(*)::BIGINT AS n,
        |    SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
        |    SUM(x::HUGEINT * y)::BIGINT AS sxy,
        |    SUM(x::HUGEINT * x)::BIGINT AS sxx,
        |    SUM(y::HUGEINT * y)::BIGINT AS syy
        |  FROM xs JOIN lags ON true JOIN ys ON ys.t = xs.t + lag
        |  GROUP BY 1 HAVING COUNT(*) >= 3)
        |SELECT lag, n, sx, sy, sxy, sxx, syy,
        |  CASE WHEN n::HUGEINT * sxx - sx::HUGEINT * sx > 0
        |        AND n::HUGEINT * syy - sy::HUGEINT * sy > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |  END AS corr
        |FROM ag ORDER BY lag""".stripMargin
  )
}
