package graft.queries

/** DuckDB oracle SQL for §2A. Mirrors Relational.* exactly: same aliases,
  * same decimal-exact arithmetic, same final casts, same ORDER BY. */
object RelationalOracle {
  val sql: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q03_join_agg" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q04_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name IN ('ASIA', 'EUROPE')
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q05_scan_agg" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q06_topk" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |ORDER BY c_acctbal DESC, c_custkey ASC
        |LIMIT 15""".stripMargin,

    "q07_distinct" ->
      """SELECT DISTINCT o_orderpriority, o_orderstatus
        |FROM orders
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "q08_window" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q09_semijoin" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q10_antijoin" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q11_outer_join" ->
      """SELECT c_custkey,
        |  COUNT(o_orderkey) AS open_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS open_value
        |FROM customer
        |LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') o ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin,

    "q12_set_ops" ->
      """SELECT c_custkey FROM (
        |  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |  UNION
        |  SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
        |) u
        |EXCEPT
        |SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q13_having" ->
      """SELECT o_custkey,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(*) >= 12 AND CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) > 500000
        |ORDER BY o_custkey""".stripMargin,

    "q14_expr" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 50000 THEN 'small'
        |       WHEN o_totalprice < 150000 THEN 'medium'
        |       ELSE 'large' END AS band,
        |  UPPER(SUBSTRING(o_orderpriority, 3, 20)) AS prio_name,
        |  o_orderstatus || '/' || o_orderpriority AS status_prio,
        |  CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
        |  CAST(ABS(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(100000 AS DECIMAL(18,2))) AS DOUBLE) AS dist_from_100k
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q15_subquery" ->
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part
        |JOIN (SELECT p_brand AS b_brand,
        |             SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS brand_sum,
        |             COUNT(*) AS brand_n
        |      FROM part GROUP BY p_brand) b ON p_brand = b_brand
        |WHERE CAST(p_retailprice AS DECIMAL(18,2)) * brand_n > brand_sum
        |ORDER BY p_partkey""".stripMargin,

    "q16_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q77_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n_orders,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    // A29: explicit mixed grouping sets — no grand-total set, so this is
    // not expressible as CUBE or ROLLUP; gid bitmask matches Spark's.
    "q92_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n_orders,
        |  CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority))
        |ORDER BY gid ASC, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q17_cte" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS month_start,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1
        |), with_prev AS (
        |  SELECT month_start, rev_dec, LAG(rev_dec, 1) OVER (ORDER BY month_start) AS prev_dec
        |  FROM monthly
        |)
        |SELECT month_start, CAST(rev_dec AS DOUBLE) AS revenue, CAST(prev_dec AS DOUBLE) AS prev_revenue
        |FROM with_prev
        |WHERE prev_dec IS NOT NULL AND rev_dec > prev_dec
        |ORDER BY month_start""".stripMargin,

    "q18_latest_per_key" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders
        |) x WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,

    "q45_percentiles" ->
      """SELECT o_orderstatus,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90,
        |  quantile_cont(o_totalprice, 0.99) AS p99,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    // A23: sketch internals differ across engines, so the oracle pins the
    // rank-error containment booleans and recomputes the exact bounds.
    "q63_approx_percentile" ->
      """SELECT o_orderstatus,
        |  TRUE AS p50_rank_ok,
        |  TRUE AS p90_rank_ok,
        |  quantile_cont(o_totalprice, 0.5) AS p50_exact,
        |  quantile_cont(o_totalprice, 0.9) AS p90_exact,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q72_window_frames" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER w AS first_key,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS min_so_far,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving3_sum
        |FROM orders WHERE o_custkey <= 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // A25: the 2-element expansion written as its UNION-ALL equivalent —
    // same rows as posexplode_outer (outer keeps non-F orders with nulls).
    "q73_lateral_explode" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderpriority, o_orderstatus
        |  FROM orders WHERE o_custkey <= 100
        |)
        |SELECT o_orderkey, pos, tag FROM (
        |  SELECT o_orderkey, CAST(0 AS BIGINT) AS pos, o_orderpriority AS tag
        |  FROM base WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, CAST(1 AS BIGINT), o_orderstatus
        |  FROM base WHERE o_orderstatus = 'F'
        |  UNION ALL
        |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR)
        |  FROM base WHERE o_orderstatus <> 'F'
        |)
        |ORDER BY o_orderkey, pos ASC NULLS FIRST""".stripMargin,

    "q56_date_spine" ->
      """WITH spine AS (
        |  SELECT unnest(generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-12-01',
        |                                INTERVAL 1 MONTH)) AS month_start
        |), monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
        |)
        |SELECT s.month_start, COALESCE(m.cnt, 0) AS n_orders
        |FROM spine s LEFT JOIN monthly m ON s.month_start = m.m
        |ORDER BY s.month_start""".stripMargin,

    "q57_string_agg" ->
      """SELECT o_custkey,
        |  string_agg(o_orderpriority, ',' ORDER BY o_orderpriority) AS prios,
        |  COUNT(*) AS n
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '2001-06-01'
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q19_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q79_full_outer" ->
      """WITH a AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_1997,
        |    COUNT(*) AS n_1997
        |  FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1
        |), b AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev_1998,
        |    COUNT(*) AS n_1998
        |  FROM orders WHERE year(o_orderdate) = 1998 GROUP BY 1
        |)
        |SELECT COALESCE(a.o_custkey, b.o_custkey) AS o_custkey,
        |  COALESCE(rev_1997, 0.0) AS rev_1997, COALESCE(n_1997, 0) AS n_1997,
        |  COALESCE(rev_1998, 0.0) AS rev_1998, COALESCE(n_1998, 0) AS n_1998,
        |  CASE WHEN a.o_custkey IS NOT NULL AND b.o_custkey IS NOT NULL THEN 'both'
        |       WHEN a.o_custkey IS NOT NULL THEN 'only_1997'
        |       ELSE 'only_1998' END AS presence
        |FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q80_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value FROM events
        |), daily AS (
        |  SELECT event_type, day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS obs
        |  FROM ev GROUP BY 1, 2
        |), b AS (
        |  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
        |), spine AS (
        |  SELECT event_type, unnest(generate_series(d0, d1)) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily), b
        |)
        |SELECT s.event_type, s.day,
        |  last_value(d.obs IGNORE NULLS) OVER (
        |    PARTITION BY s.event_type ORDER BY s.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
        |  d.obs IS NULL AS carried
        |FROM spine s LEFT JOIN daily d USING (event_type, day)
        |ORDER BY event_type, day""".stripMargin,

    // A40: linear interpolation — same spine, integer cents blend, ONE
    // IEEE division; edges (no bracketing pair) stay NULL.
    "q167_interp_fill" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value FROM events
        |), daily AS (
        |  SELECT event_type, day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM ev GROUP BY 1, 2
        |), b AS (
        |  SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ev
        |), spine AS (
        |  SELECT event_type, unnest(generate_series(d0, d1)) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily), b
        |), j AS (
        |  SELECT s.event_type, s.day, d.cents,
        |    last_value(d.cents IGNORE NULLS) OVER wp AS c0,
        |    last_value(CASE WHEN d.cents IS NOT NULL THEN s.day END IGNORE NULLS) OVER wp AS pd,
        |    first_value(d.cents IGNORE NULLS) OVER wn AS c1,
        |    first_value(CASE WHEN d.cents IS NOT NULL THEN s.day END IGNORE NULLS) OVER wn AS nd
        |  FROM spine s LEFT JOIN daily d USING (event_type, day)
        |  WINDOW wp AS (PARTITION BY s.event_type ORDER BY s.day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |         wn AS (PARTITION BY s.event_type ORDER BY s.day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |)
        |SELECT event_type, day,
        |  CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100
        |       WHEN c0 IS NULL OR c1 IS NULL THEN NULL
        |       ELSE CAST(c0 * (nd - day) + c1 * (day - pd) AS DOUBLE)
        |            / ((nd - pd) * 100) END AS value_interp,
        |  CASE WHEN cents IS NOT NULL THEN 'observed'
        |       WHEN c0 IS NULL OR c1 IS NULL THEN 'edge'
        |       ELSE 'interpolated' END AS kind
        |FROM j ORDER BY event_type, day""".stripMargin,

    // A42: step-function integral over the same daily frame — lead-gap
    // weights, exact integer integral/span, the two averages as single
    // mirrored double divisions.
    "q173_time_weighted_avg" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value FROM events
        |), daily AS (
        |  SELECT event_type, day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        |  FROM ev GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type, day, cents,
        |    COALESCE(lead(day) OVER (PARTITION BY event_type ORDER BY day) - day, 1) AS w_days
        |  FROM daily
        |), s AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    MAX(day) - MIN(day) + 1 AS span_days,
        |    CAST(SUM(cents * w_days) AS BIGINT) AS integral,
        |    CAST(SUM(cents) AS BIGINT) AS plain
        |  FROM g GROUP BY event_type
        |)
        |SELECT event_type, n_obs, span_days,
        |  CAST(integral AS DOUBLE) / CAST(span_days * 100 AS DOUBLE) AS time_weighted_avg,
        |  CAST(plain AS DOUBLE) / CAST(n_obs * 100 AS DOUBLE) AS plain_avg
        |FROM s ORDER BY event_type""".stripMargin,

    // A41: OLS trend fit replayed from the same exact power sums; the
    // slope/intercept/R²/forecast double trees mirror the Spark side
    // op-for-op so each IEEE rounding lands identically.
    "q168_trend_regression" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, value FROM events
        |), daily AS (
        |  SELECT event_type, day,
        |    CAST(day AS BIGINT) AS x,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
        |  FROM ev GROUP BY event_type, day
        |), s AS (
        |  -- HUGEINT products: BIGINT y*y overflows past ~3e9 daily cents,
        |  -- where the Spark side's DECIMAL(38,0) keeps going
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
        |    MAX(day) AS d1
        |  FROM daily GROUP BY event_type
        |), fit AS (
        |  SELECT *,
        |    CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
        |    CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS den,
        |    CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny
        |  FROM s
        |), fit2 AS (
        |  SELECT *, num / den / 100.0 AS slope_per_day FROM fit
        |), fit3 AS (
        |  SELECT *,
        |    (CAST(sy AS DOUBLE) / 100.0 - slope_per_day * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
        |  FROM fit2
        |)
        |SELECT event_type, n, slope_per_day, intercept,
        |  num * num / (den * deny) AS r2,
        |  intercept + slope_per_day * (CAST(d1 AS DOUBLE) + 1.0) AS forecast_next_day
        |FROM fit3 ORDER BY event_type""".stripMargin,

    // A30: melt replayed as UNION ALL (portable-exact; DuckDB's UNPIVOT
    // would work too, but the union form pins names and types explicitly).
    "q94_unpivot" ->
      """WITH wide AS (
        |  SELECT l_returnflag, l_linestatus,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price
        |  FROM lineitem
        |  WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |  GROUP BY l_returnflag, l_linestatus)
        |SELECT * FROM (
        |  SELECT l_returnflag, l_linestatus, 'sum_qty' AS measure, CAST(sum_qty AS DOUBLE) AS value FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, l_linestatus, 'sum_price', CAST(sum_price AS DOUBLE) FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, l_linestatus, 'sum_disc_price', CAST(sum_disc_price AS DOUBLE) FROM wide)
        |ORDER BY l_returnflag, l_linestatus, measure""".stripMargin,

    // A31: histogram — identical integer-cents binning.
    "q95_histogram" ->
      """WITH c AS (
        |  SELECT LEAST(GREATEST(
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0), 15999999) AS cc
        |  FROM lineitem),
        |b AS (SELECT cc // 500000 AS bucket FROM c)
        |SELECT bucket, bucket * 5000 AS bucket_lo, COUNT(*) AS n
        |FROM b GROUP BY bucket
        |ORDER BY bucket""".stripMargin,

    // A37: hierarchy — DuckDB's REAL recursive CTE vs the engine's path
    // doubling; row-for-row agreement across evaluation strategies.
    "q155_hierarchy" ->
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS node, doc_id // 7 AS anc FROM documents
        |  WHERE doc_id <> doc_id // 7),
        |a AS (
        |  SELECT node, anc, CAST(1 AS BIGINT) AS depth FROM e
        |  UNION ALL
        |  SELECT a.node, e.anc, a.depth + 1 FROM a JOIN e ON a.anc = e.node)
        |SELECT node, anc, depth FROM a ORDER BY node, depth""".stripMargin,

    // A36: MAD — the same two quantile_cont passes (q45-pinned equal to
    // Spark percentile), same 5·MAD flag, exact decimal flagged total.
    "q149_mad_outliers" ->
      """WITH m AS (
        |  SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
        |  FROM lineitem GROUP BY l_returnflag),
        |d AS (
        |  SELECT l.l_returnflag, l.l_extendedprice, m.med,
        |         abs(l.l_extendedprice - m.med) AS adev
        |  FROM lineitem l JOIN m USING (l_returnflag)),
        |md AS (
        |  SELECT l_returnflag, quantile_cont(adev, 0.5) AS mad, MAX(med) AS med
        |  FROM d GROUP BY l_returnflag)
        |SELECT d.l_returnflag, MAX(md.med) AS med, MAX(md.mad) AS mad,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d.adev > 5.0 * md.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers,
        |  CAST(SUM(CASE WHEN d.adev > 5.0 * md.mad
        |                THEN CAST(d.l_extendedprice AS DECIMAL(18,2))
        |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS outlier_total
        |FROM d JOIN md USING (l_returnflag)
        |GROUP BY d.l_returnflag ORDER BY d.l_returnflag""".stripMargin,

    // A35: equi-depth — the one global rank window the engine's two-level
    // form equals, the same (rank−1)·k div n bucket rule.
    "q148_equi_depth" ->
      """WITH c AS (
        |  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |         l_orderkey AS ok, l_linenumber AS ln FROM lineitem),
        |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, ok, ln) AS rn,
        |             COUNT(*) OVER () AS n FROM c)
        |SELECT (rn - 1) * 16 // n AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  MIN(c) AS lo_cents, MAX(c) AS hi_cents
        |FROM r GROUP BY 1 ORDER BY bucket""".stripMargin,

    // A34: winsorize — same percentiles (q45-pinned), same clamp, same
    // decimal total.
    "q121_winsorize" ->
      """WITH p AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_extendedprice, 0.05) AS p05,
        |         quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN l_extendedprice < p05 OR l_extendedprice > p95
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
        |  CAST(SUM(CAST(GREATEST(LEAST(l_extendedprice, p95), p05) AS DECIMAL(18,2)))
        |       AS DOUBLE) AS winsorized_total
        |FROM lineitem l JOIN p USING (l_returnflag)
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    // A33: exact decimal power sums, double read-out with the same
    // expression structure Spark evaluates — bit-identical results.
    "q112_correlation" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS x,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(18,0)) AS y
        |  FROM lineitem),
        |s AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM b GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    AS corr_price_qty,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(n AS DOUBLE) - 1) / 10000.0 AS cov_samp,
        |  CAST(sx AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS avg_price,
        |  CAST(sy AS DOUBLE) / 100.0 / CAST(n AS DOUBLE) AS avg_qty
        |FROM s ORDER BY l_returnflag""".stripMargin,

    "q108_multi_distinct" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |  CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_statuses,
        |  CAST(COUNT(DISTINCT year(o_orderdate)) AS BIGINT) AS n_years,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin
  )
}
