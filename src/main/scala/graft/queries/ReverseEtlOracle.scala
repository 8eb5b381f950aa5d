package graft.queries

/** DuckDB oracle SQL for §2B — mirrors ReverseEtl.* exactly (same derived
  * snapshots, same aliases, same ordering). */
object ReverseEtlOracle {
  private val cursor = ReverseEtl.LastCursor

  private val prevSnapshot =
    """SELECT o_orderkey, o_custkey,
      |  CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 'O' ELSE o_orderstatus END AS o_orderstatus,
      |  o_totalprice
      |FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'""".stripMargin

  private val currSnapshot =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders WHERE o_orderkey % 97 <> 0""".stripMargin

  /** The q105 SCD2 history construction (closed 1994 generation + the
    * 1997-07-01 apply), shared by the B29 apply and the B44 time-travel
    * read. Ends at the `applied` CTE — callers append their own SELECT. */
  private val scd2HistoryCtes =
    s"""WITH prev AS ($prevSnapshot), curr AS ($currSnapshot),
       |hist_closed AS (
       |  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus, o_totalprice,
       |         TIMESTAMP '1994-01-01' AS valid_from,
       |         TIMESTAMP '1995-01-01' AS valid_to, FALSE AS is_current
       |  FROM prev WHERE o_orderkey % 7 = 0),
       |j AS (
       |  SELECT h.o_orderkey AS hk, h.o_custkey AS hc, h.o_orderstatus AS hs,
       |         h.o_totalprice AS hp, TIMESTAMP '1995-01-01' AS hf,
       |         c.o_orderkey AS ck, c.o_custkey AS cc, c.o_orderstatus AS cs,
       |         c.o_totalprice AS cp,
       |         (h.o_custkey IS DISTINCT FROM c.o_custkey
       |          OR h.o_orderstatus IS DISTINCT FROM c.o_orderstatus
       |          OR h.o_totalprice IS DISTINCT FROM c.o_totalprice) AS chg
       |  FROM prev h FULL OUTER JOIN curr c ON h.o_orderkey = c.o_orderkey),
       |applied AS (
       |  SELECT ck AS o_orderkey, cc AS o_custkey, cs AS o_orderstatus,
       |         cp AS o_totalprice, TIMESTAMP '1997-07-01' AS valid_from,
       |         CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
       |  FROM j WHERE hk IS NULL
       |  UNION ALL
       |  SELECT hk, hc, hs, hp, hf, TIMESTAMP '1997-07-01', FALSE
       |  FROM j WHERE hk IS NOT NULL AND (ck IS NULL OR chg)
       |  UNION ALL
       |  SELECT hk, hc, hs, hp, hf, CAST(NULL AS TIMESTAMP), TRUE
       |  FROM j WHERE hk IS NOT NULL AND ck IS NOT NULL AND NOT chg
       |  UNION ALL
       |  SELECT ck, cc, cs, cp, TIMESTAMP '1997-07-01', CAST(NULL AS TIMESTAMP), TRUE
       |  FROM j WHERE hk IS NOT NULL AND ck IS NOT NULL AND chg)""".stripMargin

  /** One B53 value-iteration solve as `rounds` staged MATERIALIZED CTEs
    * (the l2Stages discipline — each stage references the previous once,
    * so DuckDB's textual CTE inlining stays linear): synchronized Jacobi
    * sweeps of v(s) = Σ n(s,t)·v(t) // n_out(s) with absorbing CONV/NULL
    * pinned at lookup (they are never sources) and the removed channel
    * forced to 0. Expects CTEs `tr(src, dst, n)` and `no(src, n_out)`. */
  private def markovSolve(tag: String, removed: String, rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"v_${tag}_0 AS (SELECT src AS state, 0::HUGEINT AS v FROM no),\n"
    for (i <- 1 to rounds) {
      sb ++= s"v_${tag}_$i AS MATERIALIZED (\n" +
        s"  SELECT no.src AS state,\n" +
        s"    CASE WHEN no.src = '$removed' THEN 0::HUGEINT\n" +
        s"    ELSE SUM(t.n::HUGEINT * COALESCE(vp.v,\n" +
        s"      CASE WHEN t.dst = 'CONV' THEN 1000000::HUGEINT ELSE 0::HUGEINT END))\n" +
        s"      // no.n_out END AS v\n" +
        s"  FROM no JOIN tr t ON t.src = no.src\n" +
        s"  LEFT JOIN v_${tag}_${i - 1} vp ON vp.state = t.dst\n" +
        s"  GROUP BY no.src, no.n_out),\n"
    }
    sb.toString
  }

  val sql: Map[String, String] = Map(

    // B54: item-to-item recommendations — distinct (order, part)
    // baskets, the 1024-item basket cap (refused baskets excluded from
    // every count frame, exact Σ s·(s−1) dropped-pair ledger stamped as
    // constants), directed co-occurrence counts with the >= 2 floor,
    // exact HUGEINT lift, per-item top-3 by (lift DESC, n_ab DESC,
    // rec ASC), first 150 in (item, rank) order.
    "q245_item_recs" ->
      """WITH bi0 AS MATERIALIZED (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
        |bsz AS MATERIALIZED (SELECT b, COUNT(*)::BIGINT AS sz FROM bi0 GROUP BY 1),
        |led AS (
        |  SELECT COALESCE(SUM(CASE WHEN sz > 1024 THEN 1 ELSE 0 END), 0)::BIGINT
        |           AS n_baskets_capped,
        |         CAST(COALESCE(SUM(CASE WHEN sz > 1024
        |           THEN sz::HUGEINT * (sz - 1) END), 0) AS BIGINT) AS n_pairs_dropped
        |  FROM bsz),
        |bi AS MATERIALIZED (
        |  SELECT bi0.* FROM bi0 JOIN bsz USING (b) WHERE bsz.sz <= 1024),
        |n AS (SELECT COUNT(DISTINCT b)::BIGINT AS n_baskets FROM bi),
        |items AS MATERIALIZED (
        |  SELECT i AS it, COUNT(*)::BIGINT AS n_it FROM bi GROUP BY 1),
        |pairs AS MATERIALIZED (
        |  SELECT x.i AS item, y.i AS rec, COUNT(*)::BIGINT AS n_ab
        |  FROM bi x JOIN bi y ON x.b = y.b AND x.i <> y.i
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |sc AS MATERIALIZED (
        |  SELECT p.item, p.rec, p.n_ab, a.n_it AS n_item, r.n_it AS n_rec,
        |    CAST(1000000::HUGEINT * p.n_ab * n.n_baskets
        |         // (a.n_it::HUGEINT * r.n_it) AS BIGINT) AS lift_ppm
        |  FROM pairs p JOIN items a ON a.it = p.item
        |               JOIN items r ON r.it = p.rec, n),
        |rk AS (
        |  SELECT item, rec, n_ab, n_item, n_rec, lift_ppm,
        |    ROW_NUMBER() OVER (PARTITION BY item
        |      ORDER BY lift_ppm DESC, n_ab DESC, rec ASC) AS rank
        |  FROM sc)
        |SELECT item, rank::BIGINT AS rank, rec, n_ab, n_item, n_rec, lift_ppm,
        |  led.n_baskets_capped, led.n_pairs_dropped
        |FROM rk, led WHERE rank <= 3
        |ORDER BY item, rank LIMIT 150""".stripMargin,

    // B53: Markov removal-effect attribution — journeys split at each
    // purchase, first-order transition counts, then one 32-sweep integer
    // value iteration per removal. The per-removal solves are built for
    // the HARDCODED channel list below (fixed across SFs by the
    // generator's event vocabulary) while the ch CTE derives channels
    // dynamically — so the removedCase falls through to error() on any
    // channel outside the list (ADVICE r11): vocabulary drift fails
    // LOUDLY at this coupling point instead of as a confusing NULL
    // hash mismatch.
    "q236_markov_attrib" -> {
      val chans = Seq("click", "error", "signup", "view")
      val solves = (("base", "__none__") +: chans.map(c => (c, c)))
        .map { case (tag, rm) => markovSolve(tag, rm, 32) }.mkString
      val removedCase = chans.map(c =>
        s"      WHEN '$c' THEN (SELECT v FROM v_${c}_32 WHERE state = 'START')").mkString("\n") +
        "\n      ELSE error('q236 oracle: channel vocabulary drifted beyond {" +
        chans.mkString(",") + "} — got ' || ch.channel || '; update the hardcoded solve list')"
      s"""WITH e AS (
         |  SELECT user_id, event_id, ts, (event_type = 'purchase') AS conv,
         |    CASE WHEN event_type = 'purchase' THEN 'CONV' ELSE event_type END AS state
         |  FROM events),
         |j AS MATERIALIZED (
         |  SELECT user_id, event_id, ts, conv, state,
         |    COALESCE(SUM(CASE WHEN conv THEN 1 ELSE 0 END) OVER (
         |      PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS jr
         |  FROM e),
         |s AS MATERIALIZED (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY user_id, jr ORDER BY ts, event_id) AS rn,
         |    LEAD(state) OVER (PARTITION BY user_id, jr ORDER BY ts, event_id) AS nxt
         |  FROM j),
         |tr AS MATERIALIZED (
         |  SELECT src, dst, COUNT(*)::BIGINT AS n FROM (
         |    SELECT 'START' AS src, state AS dst FROM s WHERE rn = 1
         |    UNION ALL SELECT state, COALESCE(nxt, 'NULL') FROM s WHERE state <> 'CONV')
         |  GROUP BY 1, 2),
         |no AS MATERIALIZED (SELECT src, SUM(n)::BIGINT AS n_out FROM tr GROUP BY 1),
         |ch AS (
         |  SELECT DISTINCT st AS channel
         |  FROM (SELECT src AS st FROM tr UNION SELECT dst FROM tr)
         |  WHERE st NOT IN ('START', 'CONV', 'NULL')),
         |tch AS (
         |  SELECT dst AS channel, SUM(n)::BIGINT AS n_touches
         |  FROM tr WHERE dst <> 'NULL' GROUP BY 1),
         |$solves
         |res AS (
         |  SELECT ch.channel, COALESCE(tch.n_touches, 0)::BIGINT AS n_touches,
         |    (SELECT v FROM v_base_32 WHERE state = 'START')::BIGINT AS p_base_ppm,
         |    (CASE ch.channel
         |$removedCase
         |    END)::BIGINT AS p_removed_ppm
         |  FROM ch LEFT JOIN tch USING (channel)),
         |tot AS (SELECT SUM(p_base_ppm - p_removed_ppm)::BIGINT AS rt FROM res)
         |SELECT channel, n_touches, p_base_ppm, p_removed_ppm,
         |  p_base_ppm - p_removed_ppm AS removal_ppm,
         |  CASE WHEN rt > 0
         |    THEN 1000000 * (p_base_ppm - p_removed_ppm) // rt END AS attribution_ppm
         |FROM res, tot ORDER BY channel""".stripMargin
    },
    "q20_cursor_incremental" ->
      s"""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
         |FROM orders
         |WHERE o_orderdate > TIMESTAMP '$cursor'
         |ORDER BY o_orderdate ASC, o_orderkey ASC""".stripMargin,

    "q21_max_cursor" ->
      s"""SELECT max(o_orderdate) AS last_cursor, COUNT(*) AS n_rows
         |FROM orders
         |WHERE o_orderdate > TIMESTAMP '$cursor'""".stripMargin,

    "q22_snapshot_diff" ->
      s"""WITH prev AS ($prevSnapshot), curr AS ($currSnapshot)
         |SELECT COALESCE(curr.o_orderkey, prev.o_orderkey) AS key,
         |  CASE WHEN prev.o_orderkey IS NULL THEN 'insert'
         |       WHEN curr.o_orderkey IS NULL THEN 'delete'
         |       WHEN (curr.o_custkey IS DISTINCT FROM prev.o_custkey)
         |         OR (curr.o_orderstatus IS DISTINCT FROM prev.o_orderstatus)
         |         OR (curr.o_totalprice IS DISTINCT FROM prev.o_totalprice) THEN 'update'
         |       ELSE 'unchanged' END AS change_type
         |FROM curr FULL OUTER JOIN prev ON curr.o_orderkey = prev.o_orderkey
         |WHERE CASE WHEN prev.o_orderkey IS NULL THEN 'insert'
         |       WHEN curr.o_orderkey IS NULL THEN 'delete'
         |       WHEN (curr.o_custkey IS DISTINCT FROM prev.o_custkey)
         |         OR (curr.o_orderstatus IS DISTINCT FROM prev.o_orderstatus)
         |         OR (curr.o_totalprice IS DISTINCT FROM prev.o_totalprice) THEN 'update'
         |       ELSE 'unchanged' END <> 'unchanged'
         |ORDER BY key""".stripMargin,

    "q23_deleted_keys" ->
      s"""WITH prev AS ($prevSnapshot), curr AS ($currSnapshot)
         |SELECT prev.o_orderkey
         |FROM prev WHERE NOT EXISTS (SELECT 1 FROM curr WHERE curr.o_orderkey = prev.o_orderkey)
         |ORDER BY o_orderkey""".stripMargin,

    "q24_audience_hash" ->
      """SELECT c_custkey, email, sha256(email) AS hashed_email
        |FROM (SELECT c_custkey, lower(replace(c_name, '#', '.')) || '@example.com' AS email FROM customer)
        |ORDER BY c_custkey""".stripMargin,

    "q25_validate_split" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_custkey IS NULL THEN 'missing_key'
        |       WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status'
        |       WHEN o_totalprice <= 0 OR o_totalprice > 300000 THEN 'price_range'
        |       ELSE NULL END AS reject_reason,
        |  (CASE WHEN o_custkey IS NULL THEN 'missing_key'
        |       WHEN o_orderstatus NOT IN ('O','F','P') THEN 'bad_status'
        |       WHEN o_totalprice <= 0 OR o_totalprice > 300000 THEN 'price_range'
        |       ELSE NULL END) IS NULL AS is_valid
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,

    "q26_column_map" ->
      """SELECT CAST(c_custkey AS VARCHAR) AS external_id,
        |  lower(replace(c_name, '#', '-')) AS display_name,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS balance,
        |  CAST(c_nationkey AS BIGINT) AS nation_id,
        |  lower(c_mktsegment) AS segment
        |FROM customer
        |ORDER BY external_id""".stripMargin,

    "q27_batcher" ->
      """SELECT o_orderkey, o_orderstatus,
        |  concat_ws('-', o_orderstatus, salt, CAST((rn - 1) // 1000 AS BIGINT)) AS batch_key,
        |  CAST((rn - 1) % 1000 AS BIGINT) AS seq_in_batch
        |FROM (SELECT o_orderkey, o_orderstatus, salt,
        |        ROW_NUMBER() OVER (PARTITION BY o_orderstatus, salt ORDER BY o_orderkey) AS rn
        |      FROM (SELECT o_orderkey, o_orderstatus,
        |              (CAST(CONCAT('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)
        |                 & 2147483647) % 16 AS salt
        |            FROM orders))
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin,

    "q28_enrich" ->
      """SELECT c_custkey, c_name, o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS order_value
        |FROM customer
        |LEFT JOIN (SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1998-01-01') o
        |  ON c_custkey = o.o_custkey
        |ORDER BY c_custkey ASC, o_orderkey ASC NULLS FIRST""".stripMargin,

    "q29_upsert_keys" ->
      """SELECT c_custkey AS external_id, m.internal_id,
        |  CASE WHEN m.internal_id IS NULL THEN 'create' ELSE 'update' END AS op
        |FROM customer
        |LEFT JOIN (SELECT c_custkey AS m_external_id,
        |             (c_custkey * 2654435761) % 1000000007 AS internal_id
        |           FROM customer WHERE c_custkey % 3 <> 0) m
        |  ON c_custkey = m.m_external_id
        |ORDER BY external_id""".stripMargin,

    "q47_column_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS custkey_nulls,
        |  COUNT(DISTINCT o_custkey) AS custkey_distinct,
        |  COUNT(DISTINCT o_orderstatus) AS status_distinct,
        |  CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_min,
        |  CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_max,
        |  MIN(o_orderdate) AS date_min,
        |  MAX(o_orderdate) AS date_max
        |FROM orders""".stripMargin,

    // B20: every generated rule recomputed from first principles — the
    // *_type rules for same-typed fields are identically zero, the rest
    // mirror try_cast / enum / range / pattern semantics.
    "q61_schema_validate" ->
      """SELECT
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS o_orderkey_required,
        |  CAST(0 AS BIGINT) AS o_orderkey_type,
        |  CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND TRY_CAST(o_custkey AS INTEGER) IS NULL
        |           THEN 1 ELSE 0 END) AS BIGINT) AS o_custkey_type,
        |  CAST(0 AS BIGINT) AS o_orderstatus_type,
        |  CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL AND o_orderstatus NOT IN ('F', 'O')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS o_orderstatus_enum,
        |  CAST(0 AS BIGINT) AS o_totalprice_type,
        |  CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_min,
        |  CAST(SUM(CASE WHEN o_totalprice > 250000.0 THEN 1 ELSE 0 END) AS BIGINT) AS o_totalprice_max,
        |  CAST(0 AS BIGINT) AS o_orderpriority_type,
        |  CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
        |                 AND NOT regexp_matches(o_orderpriority, '^[1-3]-')
        |           THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_pattern
        |FROM orders""".stripMargin,

    // B21: the bloom prefilter is invisible to semantics — the oracle is
    // the plain ANSI EXISTS the operator must exactly equal.
    "q66_bloom_prefilter" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM customer c
        |              WHERE c.c_custkey = o.o_custkey
        |                AND c.c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // B23: membership delta — set difference in both directions, payload
    // joined after the delta; sha256 identifier identical to q24's.
    "q89_audience_diff" ->
      """WITH prev AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
        |), cur AS (
        |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |), delta AS (
        |  SELECT COALESCE(c.o_custkey, p.o_custkey) AS k,
        |         CASE WHEN p.o_custkey IS NULL THEN 'add' ELSE 'remove' END AS op
        |  FROM cur c FULL OUTER JOIN prev p ON c.o_custkey = p.o_custkey
        |  WHERE c.o_custkey IS NULL OR p.o_custkey IS NULL
        |)
        |SELECT cu.c_custkey,
        |       sha256(lower(replace(cu.c_name, '#', '.')) || '@example.com') AS hashed_email,
        |       d.op
        |FROM delta d JOIN customer cu ON cu.c_custkey = d.k
        |ORDER BY cu.c_custkey""".stripMargin,

    // B24: the one-shot aggregate the history+delta state merge must equal
    // — decimal sums make the merge law exact, avg derives from the sum.
    "q90_incremental_agg" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  MIN(o_totalprice) AS min_value,
        |  MAX(o_totalprice) AS max_value,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // B39: incremental join maintenance must equal the ONE-SHOT recompute
    // over the post-delta fact against the new dim — that equality IS the
    // correctness statement, so the oracle runs the one-shot form.
    "q150_incremental_join" ->
      """WITH dim AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_custkey % 100 = 0 THEN c_mktsegment || '_v2'
        |         ELSE c_mktsegment END AS c_mktsegment
        |  FROM customer),
        |f AS (
        |  SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice
        |  FROM orders
        |  WHERE NOT (o_orderdate < TIMESTAMP '1997-07-01' AND o_orderkey % 1000 = 0))
        |SELECT f.o_orderkey, f.c_custkey, f.o_totalprice, d.c_mktsegment
        |FROM f LEFT JOIN dim d USING (c_custkey)
        |ORDER BY f.o_orderkey""".stripMargin,

    // B32: three-way merge — the same two full-outer joins and the same
    // branch order, null-safe compares throughout.
    "q118_three_way_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-07-01'),
        |ours AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01' THEN 'O' ELSE o_orderstatus END AS o_orderstatus,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 97 <> 0),
        |theirs AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 10.0 ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-10-01' AND o_orderkey % 89 <> 0),
        |j AS (
        |  SELECT COALESCE(b.o_orderkey, o.o_orderkey, t2.o_orderkey) AS k,
        |    b.o_orderkey IS NOT NULL AS in_b, o.o_orderkey IS NOT NULL AS in_o,
        |    t2.o_orderkey IS NOT NULL AS in_t,
        |    b.o_custkey AS b_ck, b.o_orderstatus AS b_st, b.o_totalprice AS b_pr,
        |    o.o_custkey AS o_ck, o.o_orderstatus AS o_st, o.o_totalprice AS o_pr,
        |    t2.o_custkey AS t_ck, t2.o_orderstatus AS t_st, t2.o_totalprice AS t_pr
        |  FROM base b
        |  FULL OUTER JOIN ours o ON b.o_orderkey = o.o_orderkey
        |  FULL OUTER JOIN theirs t2 ON COALESCE(b.o_orderkey, o.o_orderkey) = t2.o_orderkey),
        |c AS (
        |  SELECT *,
        |    ((in_b AND in_o AND (b_ck IS DISTINCT FROM o_ck OR b_st IS DISTINCT FROM o_st
        |                         OR b_pr IS DISTINCT FROM o_pr))
        |     OR (in_b AND NOT in_o) OR (NOT in_b AND in_o)) AS ours_chg,
        |    ((in_b AND in_t AND (b_ck IS DISTINCT FROM t_ck OR b_st IS DISTINCT FROM t_st
        |                         OR b_pr IS DISTINCT FROM t_pr))
        |     OR (in_b AND NOT in_t) OR (NOT in_b AND in_t)) AS theirs_chg,
        |    ((in_o = in_t) AND (NOT in_o OR (o_ck IS NOT DISTINCT FROM t_ck
        |       AND o_st IS NOT DISTINCT FROM t_st AND o_pr IS NOT DISTINCT FROM t_pr))) AS same_chg
        |  FROM j),
        |w AS (
        |  SELECT *,
        |    CASE WHEN ours_chg AND theirs_chg AND same_chg THEN 'both'
        |         WHEN ours_chg AND theirs_chg AND NOT in_o AND in_t THEN 'theirs'
        |         WHEN ours_chg AND theirs_chg AND in_o AND NOT in_t THEN 'ours'
        |         WHEN ours_chg AND theirs_chg THEN 'ours'
        |         WHEN ours_chg THEN 'ours'
        |         WHEN theirs_chg THEN 'theirs'
        |         ELSE 'none' END AS res,
        |    (ours_chg AND theirs_chg AND NOT same_chg) AS conflict
        |  FROM c)
        |SELECT k AS o_orderkey,
        |  CASE WHEN res IN ('ours','both') THEN o_ck WHEN res = 'theirs' THEN t_ck ELSE b_ck END AS merged_o_custkey,
        |  CASE WHEN res IN ('ours','both') THEN o_st WHEN res = 'theirs' THEN t_st ELSE b_st END AS merged_o_orderstatus,
        |  CASE WHEN res IN ('ours','both') THEN o_pr WHEN res = 'theirs' THEN t_pr ELSE b_pr END AS merged_o_totalprice,
        |  CASE WHEN NOT (CASE WHEN res IN ('ours','both') THEN in_o
        |                      WHEN res = 'theirs' THEN in_t ELSE in_b END) THEN 'delete'
        |       WHEN res = 'none' THEN 'keep' ELSE 'update' END AS action,
        |  res AS resolution, conflict
        |FROM w ORDER BY o_orderkey""".stripMargin,

    // B30: expectations — each check recomputed from first principles.
    "q113_expectations" ->
      """WITH r AS (
        |  SELECT 'unique:o_orderkey' AS expectation,
        |    CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders) AS BIGINT) AS failures
        |  UNION ALL
        |  SELECT 'unique:o_custkey',
        |    CAST((SELECT COUNT(*) - COUNT(DISTINCT o_custkey) FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'not_null:o_custkey',
        |    CAST((SELECT COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'accepted:o_orderstatus',
        |    CAST((SELECT COUNT(CASE WHEN o_orderstatus IS NOT NULL
        |                             AND o_orderstatus NOT IN ('O','F','P') THEN 1 END)
        |          FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'freshness:o_orderdate',
        |    CAST((SELECT CASE WHEN MAX(o_orderdate) < TIMESTAMP '1998-06-01' THEN 1 ELSE 0 END
        |          FROM orders) AS BIGINT)
        |  UNION ALL
        |  SELECT 'fk:o_custkey->customer.c_custkey',
        |    CAST((SELECT COUNT(*) FROM orders o
        |          WHERE o_custkey IS NOT NULL
        |            AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |          AS BIGINT)
        |)
        |SELECT expectation, failures, failures = 0 AS passed
        |FROM r ORDER BY expectation""".stripMargin,

    // B29: SCD2 apply — closed generation passes through; the open
    // generation full-outer joins the snapshot and each row expands to its
    // 1-2 output versions, branch by branch.
    "q105_scd2" ->
      s"""$scd2HistoryCtes
         |SELECT * FROM (SELECT * FROM hist_closed UNION ALL SELECT * FROM applied)
         |ORDER BY o_orderkey, valid_from""".stripMargin,

    // B44: point-in-time dimension read over the same SCD2 history —
    // two probe instants (inside the closed 1994 generation; after the
    // 1997 apply), the half-open [valid_from, valid_to) membership rule.
    "q165_time_travel" ->
      s"""$scd2HistoryCtes,
         |hist AS (SELECT * FROM hist_closed UNION ALL SELECT * FROM applied),
         |probes AS (SELECT TIMESTAMP '1994-06-01' AS probe UNION ALL
         |           SELECT TIMESTAMP '1997-08-01')
         |SELECT strftime(probe, '%Y-%m-%d') AS probe, o_orderkey, o_custkey,
         |       o_orderstatus, o_totalprice, valid_from
         |FROM hist, probes
         |WHERE valid_from <= probe AND (valid_to IS NULL OR valid_to > probe)
         |ORDER BY probe, o_orderkey""".stripMargin,

    // B45: deletion propagation — FK cascade via EXISTS, per-table purge
    // counts with exact key checksums.
    "q166_deletion_sweep" ->
      """WITH req AS (
        |  SELECT c_custkey AS k FROM customer WHERE c_acctbal < -800),
        |op AS (
        |  SELECT o_orderkey FROM orders o
        |  WHERE EXISTS (SELECT 1 FROM req WHERE req.k = o.o_custkey)),
        |ip AS (
        |  SELECT l_orderkey FROM lineitem l
        |  WHERE EXISTS (SELECT 1 FROM op WHERE op.o_orderkey = l.l_orderkey)),
        |a AS (
        |  SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_purged,
        |         CAST(COALESCE(SUM(k), 0) AS BIGINT) AS key_sum,
        |         CAST(MIN(k) AS BIGINT) AS key_min, CAST(MAX(k) AS BIGINT) AS key_max
        |  FROM req
        |  UNION ALL
        |  SELECT 'orders', CAST(COUNT(*) AS BIGINT),
        |         CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT),
        |         CAST(MIN(o_orderkey) AS BIGINT), CAST(MAX(o_orderkey) AS BIGINT)
        |  FROM op
        |  UNION ALL
        |  SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
        |         CAST(COALESCE(SUM(l_orderkey), 0) AS BIGINT),
        |         CAST(MIN(l_orderkey) AS BIGINT), CAST(MAX(l_orderkey) AS BIGINT)
        |  FROM ip)
        |SELECT * FROM a ORDER BY table_name""".stripMargin,

    // B28: key-skew profile — counts, deterministic top-10, exact shares.
    "q104_skew_profile" ->
      """WITH c AS (
        |  SELECT CAST(o_custkey AS VARCHAR) AS key, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
        |         CAST(COUNT(*) AS BIGINT) AS n_keys,
        |         CAST(MAX(n) AS BIGINT) AS max_n
        |  FROM c),
        |top AS (SELECT key, n FROM c ORDER BY n DESC, key ASC LIMIT 10)
        |SELECT key, n, total_rows, n_keys,
        |  CAST(n AS DOUBLE) / total_rows AS share,
        |  CAST(max_n AS DOUBLE) * n_keys / total_rows AS skew_factor
        |FROM top, t
        |ORDER BY n DESC, key ASC""".stripMargin,

    // B43: scalar-distribution drift — fixed 25k bins on o_totalprice,
    // pre-1997 reference vs current, integer ppm shares, TVD scalar.
    // B49: referential integrity — one anti-join count per declared
    // relation, NULL keys ledgered separately, per-mille truncating.
    "q204_referential_integrity" -> {
      def rel(name: String, child: String, key: String,
              parent: String, pkey: String): String =
        s"""SELECT '$name' AS relation,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child) AS n_rows,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child WHERE $key IS NULL) AS n_null_keys,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $child c
           |     WHERE c.$key IS NOT NULL
           |       AND NOT EXISTS (SELECT 1 FROM $parent p WHERE p.$pkey = c.$key)) AS n_orphans""".stripMargin
      val rels = Seq(
        rel("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        rel("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        rel("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        rel("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        rel("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"))
      s"""WITH audits AS (
         |${rels.mkString("\n UNION ALL\n")}
         |)
         |SELECT relation, n_rows, n_null_keys, n_orphans,
         |  n_orphans * 1000 // n_rows AS orphans_pm
         |FROM audits ORDER BY relation""".stripMargin
    },

    "q162_drift_audit" ->
      """WITH binned AS (
        |  SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bin,
        |    CASE WHEN o_orderdate < TIMESTAMP '1997-01-01' THEN 1 ELSE 0 END AS is_old
        |  FROM orders
        |), per_bin AS (
        |  SELECT bin, CAST(SUM(is_old) AS BIGINT) AS n_old,
        |    CAST(SUM(1 - is_old) AS BIGINT) AS n_new
        |  FROM binned GROUP BY bin
        |), t AS (
        |  SELECT CAST(SUM(is_old) AS BIGINT) AS told,
        |    CAST(SUM(1 - is_old) AS BIGINT) AS tnew FROM binned
        |), shares AS (
        |  SELECT bin, n_old, n_new,
        |    n_old * 1000000 // told AS share_old_ppm,
        |    n_new * 1000000 // tnew AS share_new_ppm,
        |    ABS(n_new * 1000000 // tnew - n_old * 1000000 // told) AS gap_ppm
        |  FROM per_bin, t
        |), tvd AS (SELECT CAST(SUM(gap_ppm) // 2 AS BIGINT) AS tvd_ppm FROM shares)
        |SELECT bin, n_old, n_new, share_old_ppm, share_new_ppm, gap_ppm, tvd_ppm
        |FROM shares, tvd
        |ORDER BY bin""".stripMargin,

    // B52: time-decay attribution — same forward-ASOF ownership as q172,
    // 2^-half-lives ppm weights via the shift, per-conversion credit
    // normalization with the remainder on the most recent touch.
    "q231_time_decay" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value FROM events
        |), touches AS (
        |  SELECT event_id, user_id, event_type AS channel, ts_us
        |  FROM ev WHERE event_type IN ('view', 'click')
        |), conv AS (
        |  SELECT user_id, ts_us AS conv_ts, MAX(event_id) AS conv_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
        |), tagged AS (
        |  SELECT t.*, c.conv_id AS c_conv_id, c.conv_ts AS c_conv_ts,
        |         c.value_cents AS c_value_cents
        |  FROM touches t ASOF LEFT JOIN conv c
        |    ON t.user_id = c.user_id AND t.ts_us < c.conv_ts
        |), inw AS (
        |  SELECT * FROM tagged
        |  WHERE c_conv_id IS NOT NULL AND c_conv_ts - ts_us <= 604800000000
        |), ww AS (
        |  SELECT *, (c_conv_ts - ts_us) // 86400000000 AS half_lives,
        |    (1000000 // (1::BIGINT << LEAST((c_conv_ts - ts_us) // 86400000000, 19)::INT))::BIGINT AS wgt
        |  FROM inw
        |), sums AS (
        |  SELECT *, SUM(wgt) OVER (PARTITION BY c_conv_id)::BIGINT AS wsum,
        |    row_number() OVER (PARTITION BY c_conv_id ORDER BY ts_us, event_id)::BIGINT AS pos,
        |    COUNT(*) OVER (PARTITION BY c_conv_id)::BIGINT AS n
        |  FROM ww
        |), cb AS (
        |  SELECT *, 1000000 * wgt // wsum AS credit_base FROM sums
        |), cr AS (
        |  SELECT *, credit_base + CASE WHEN pos = n
        |    THEN 1000000 - SUM(credit_base) OVER (PARTITION BY c_conv_id)
        |    ELSE 0 END AS credit_ppm
        |  FROM cb)
        |SELECT channel, half_lives, COUNT(*)::BIGINT AS n_touches,
        |  SUM(credit_ppm)::BIGINT AS credit_ppm_total,
        |  SUM(c_value_cents * credit_ppm // 1000000)::BIGINT AS attributed_cents_total
        |FROM cr GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // B47: multi-touch attribution — forward ASOF tags each touch with
    // its next conversion; the U-shaped ppm credit and the truncating
    // money split mirror the Spark when-chain branch for branch.
    "q172_attribution" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us, value FROM events
        |), touches AS (
        |  SELECT event_id, user_id, event_type AS channel, ts_us
        |  FROM ev WHERE event_type IN ('view', 'click')
        |), conv AS (
        |  SELECT user_id, ts_us AS conv_ts, MAX(event_id) AS conv_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
        |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
        |), tagged AS (
        |  SELECT t.*, c.conv_id AS c_conv_id, c.conv_ts AS c_conv_ts,
        |         c.value_cents AS c_value_cents
        |  FROM touches t ASOF LEFT JOIN conv c
        |    ON t.user_id = c.user_id AND t.ts_us < c.conv_ts
        |), inw AS (
        |  SELECT * FROM tagged
        |  WHERE c_conv_id IS NOT NULL AND c_conv_ts - ts_us <= 604800000000
        |), pos AS (
        |  SELECT *,
        |    CAST(row_number() OVER (PARTITION BY c_conv_id ORDER BY ts_us, event_id) AS BIGINT) AS pos,
        |    CAST(count(*) OVER (PARTITION BY c_conv_id) AS BIGINT) AS n
        |  FROM inw
        |), credited AS (
        |  SELECT channel,
        |    CASE WHEN pos = 1 THEN 'first' WHEN pos = n THEN 'last'
        |         ELSE 'middle' END AS position_class,
        |    CASE WHEN n = 1 THEN CAST(1000000 AS BIGINT)
        |         WHEN n = 2 THEN CAST(500000 AS BIGINT)
        |         WHEN pos = 1 THEN CAST(400000 AS BIGINT)
        |         WHEN pos = n THEN CAST(400000 + (200000 - 200000 // (n - 2) * (n - 2)) AS BIGINT)
        |         ELSE CAST(200000 // (n - 2) AS BIGINT) END AS credit_ppm,
        |    c_value_cents
        |  FROM pos
        |)
        |SELECT channel, position_class, CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(SUM(credit_ppm) AS BIGINT) AS credit_ppm_total,
        |  CAST(SUM(c_value_cents * credit_ppm // 1000000) AS BIGINT) AS attributed_cents_total
        |FROM credited GROUP BY channel, position_class
        |ORDER BY channel, position_class""".stripMargin,

    // B51: Kaplan-Meier — churn/censor assignment, distinct-duration
    // frame with cumulative at-risk counts, the per-step truncating
    // survival product replayed by a recursive CTE.
    "q229_survival" ->
      """WITH RECURSIVE per AS (
        |  SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) AS first_d,
        |         MAX(CAST(o_orderdate AS DATE)) AS last_d
        |  FROM orders GROUP BY 1),
        |ref AS (SELECT MAX(last_d) AS ref_d FROM per),
        |subj AS (
        |  SELECT (CASE WHEN (ref_d - last_d) > 60 THEN 1 ELSE 0 END)::BIGINT AS ev,
        |    (CASE WHEN (ref_d - last_d) > 60 THEN (last_d - first_d)
        |          ELSE (ref_d - first_d) END)::BIGINT AS t
        |  FROM per, ref),
        |byt AS (SELECT t, SUM(ev)::BIGINT AS d, SUM(1 - ev)::BIGINT AS c
        |        FROM subj GROUP BY 1),
        |riskd AS (
        |  SELECT *, (SUM(d + c) OVER ()
        |    - COALESCE(SUM(d + c) OVER (ORDER BY t ASC
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT AS n_risk
        |  FROM byt),
        |evr AS MATERIALIZED (
        |  SELECT t, n_risk, d, c, row_number() OVER (ORDER BY t)::BIGINT AS rn
        |  FROM riskd WHERE d >= 1),
        |walk AS (
        |  SELECT t, n_risk, d, c, rn,
        |         1000000 * (n_risk - d) // n_risk AS sp
        |  FROM evr WHERE rn = 1
        |  UNION ALL
        |  SELECT e.t, e.n_risk, e.d, e.c, e.rn,
        |         w.sp * (e.n_risk - e.d) // e.n_risk AS sp
        |  FROM evr e JOIN walk w ON e.rn = w.rn + 1)
        |SELECT t, n_risk, d AS n_events, c AS n_censored, sp AS surv_ppm
        |FROM walk ORDER BY t""".stripMargin,

    // B50: RFM segmentation — per-customer aggregates, three best-first
    // rankings (id ties), the equal-population quintile formula
    // 5 − (5·(rank−1)) // n, and the ordered segment CASE — every step
    // exact integers.
    "q224_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey AS cust, MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |         COUNT(*)::BIGINT AS freq,
        |         (SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100)::BIGINT AS mon_cents
        |  FROM orders GROUP BY 1),
        |ref AS (SELECT MAX(last_d) AS ref_d FROM per),
        |base AS (
        |  SELECT cust, (ref_d - last_d)::BIGINT AS rec_days, freq, mon_cents
        |  FROM per, ref),
        |rk AS (
        |  SELECT cust, rec_days, freq, mon_cents,
        |    row_number() OVER (ORDER BY -rec_days DESC, cust)::BIGINT AS rr,
        |    row_number() OVER (ORDER BY freq DESC, cust)::BIGINT AS fr,
        |    row_number() OVER (ORDER BY mon_cents DESC, cust)::BIGINT AS mr,
        |    COUNT(*) OVER ()::BIGINT AS n
        |  FROM base),
        |sc AS (
        |  SELECT cust, rec_days, freq, mon_cents,
        |    5 - (5 * (rr - 1)) // n AS r_score,
        |    5 - (5 * (fr - 1)) // n AS f_score,
        |    5 - (5 * (mr - 1)) // n AS m_score
        |  FROM rk)
        |SELECT cust, rec_days, freq, mon_cents, r_score, f_score, m_score,
        |  r_score::VARCHAR || f_score::VARCHAR || m_score::VARCHAR AS rfm,
        |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
        |       WHEN f_score >= 4 THEN 'loyal'
        |       WHEN r_score <= 2 AND (f_score >= 3 OR m_score >= 3) THEN 'at_risk'
        |       WHEN r_score <= 2 THEN 'hibernating'
        |       WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
        |       ELSE 'regular' END AS segment
        |FROM sc ORDER BY cust""".stripMargin
  )
}
