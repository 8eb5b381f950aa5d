package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q._

/**
 * §2A — the relational query core: the "model" surface a syncmaven user
 * writes SQL against (reference: packages/core/src/lib/sql.ts — models are
 * single SELECTs over the warehouse). Re-expressed with the DataFrame API so
 * Catalyst plans pushdown, pruning, broadcast and partial aggregation.
 *
 * Conventions shared with the DuckDB oracle (see Catalog.oracleSql):
 *  - money math in DecimalType(18,2) (exact), final cast to double;
 *  - computed integers cast to long;
 *  - every result has a total deterministic ORDER BY.
 */
object Relational {

  /** A1: filter + project; predicates and projection push into the scan. */
  def q01FilterProject(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1997-01-01").cast("timestamp") &&
              col("l_discount") > lit(0.05))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** A2: TPC-H Q1-shape groupBy with multiple aggregates (partial-agg friendly). */
  def q02Agg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        money(sum(dec(col("l_quantity")))).as("sum_qty"),
        money(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        money(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
        (money(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A3: TPC-H Q3 shape — selective dims join fact, agg, top-10. */
  def q03JoinAgg(t: Tables): DataFrame = {
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING")
    t.lineitem
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
      .join(t.orders.filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(money(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** A4: TPC-H Q5 shape — 6-way join, dims broadcast, agg by nation. */
  def q04Multijoin(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                            col("o_orderdate") <  lit("1998-01-01").cast("timestamp")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.customer),
            col("o_custkey") === col("c_custkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t.region.filter(col("r_name").isin("ASIA", "EUROPE"))),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(money(sum(revenueTerm(col("l_extendedprice"), col("l_discount")))).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("n_name")

  /** A5: TPC-H Q6 shape — selective scan, single aggregate row. */
  def q05ScanAgg(t: Tables): DataFrame =
    t.lineitem
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
              col("l_discount").between(0.03, 0.07) &&
              col("l_quantity") < 24)
      .agg(money(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))).as("revenue"),
           count(lit(1)).as("n_items"))

  /** A6: global top-k — plans as TakeOrderedAndProject, not a full sort. */
  def q06Topk(t: Tables): DataFrame =
    t.customer
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      .limit(15)

  /** A7: distinct (shuffle on the distinct key set, partial aggregation). */
  def q07Distinct(t: Tables): DataFrame =
    t.orders.select("o_orderpriority", "o_orderstatus").distinct()
      .orderBy("o_orderpriority", "o_orderstatus")

  /** A8: window functions — row_number / lag / running sum per customer. */
  def q08Window(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    t.orders
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        money(sum(dec(col("o_totalprice"))).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** A9: semi join — customers that placed an urgent order (EXISTS). */
  def q09Semijoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** A10: anti join — customers with no orders at all (NOT EXISTS). */
  def q10Antijoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")

  /** A11: left outer join + null-safe aggregation. */
  def q11OuterJoin(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderstatus") === "O"),
            col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("open_orders"),
           coalesce(money(sum(dec(col("o_totalprice")))), lit(0.0)).as("open_value"))
      .orderBy("c_custkey")

  /** A12: set operations — UNION (distinct) then EXCEPT. */
  def q12SetOps(t: Tables): DataFrame = {
    val building = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val bigSpenders = t.orders.filter(col("o_totalprice") > 150000).select(col("o_custkey").as("c_custkey"))
    val inactive = t.customer.join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti").select("c_custkey")
    building.union(bigSpenders).distinct().except(inactive).orderBy("c_custkey")
  }

  /** A13: HAVING — post-aggregation filter stays after the partial agg. */
  def q13Having(t: Tables): DataFrame =
    t.orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
           money(sum(dec(col("o_totalprice")))).as("total_spent"))
      .filter(col("n_orders") >= 12 && col("total_spent") > 500000)
      .orderBy("o_custkey")

  /** A14: expression zoo — case/when, string, date and math functions. */
  def q14Expr(t: Tables): DataFrame =
    t.orders
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 150000, "medium")
          .otherwise("large").as("band"),
        upper(substring(col("o_orderpriority"), 3, 20)).as("prio_name"),
        concat(col("o_orderstatus"), lit("/"), col("o_orderpriority")).as("status_prio"),
        year(col("o_orderdate")).cast("long").as("order_year"),
        month(col("o_orderdate")).cast("long").as("order_month"),
        money(abs(dec(col("o_totalprice")) - lit(100000).cast(Dec))).as("dist_from_100k"))
      .orderBy("o_orderkey")

  /** A15: correlated-subquery shape — parts pricier than their brand average.
    * Expressed as an agg+join; `price * n > sum` avoids inexact division. */
  def q15Subquery(t: Tables): DataFrame = {
    val brandStats = t.part.groupBy(col("p_brand").as("b_brand"))
      .agg(sum(dec(col("p_retailprice"))).as("brand_sum"), count(lit(1)).as("brand_n"))
    t.part
      .join(broadcast(brandStats), col("p_brand") === col("b_brand"))
      .filter(dec(col("p_retailprice")) * col("brand_n") > col("brand_sum"))
      .select("p_partkey", "p_brand", "p_retailprice")
      .orderBy("p_partkey")
  }

  /** A16: ROLLUP grouping sets with explicit null-first ordering. */
  def q16Rollup(t: Tables): DataFrame =
    t.lineitem
      .rollup("l_returnflag", "l_linestatus")
      .agg(money(sum(dec(col("l_quantity")))).as("sum_qty"),
           count(lit(1)).as("n_items"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** A26: CUBE — all grouping-set combinations (rollup's big sibling;
    * Spark plans one Expand + one aggregation, same as rollup). The
    * grouping_id column disambiguates real NULL keys from subtotal rows —
    * without it, a NULL-keyed data row and its subtotal hash-collide. */
  def q77Cube(t: Tables): DataFrame =
    t.orders
      .cube("o_orderstatus", "o_orderpriority")
      .agg(money(sum(dec(col("o_totalprice")))).as("total"),
           count(lit(1)).as("n_orders"),
           grouping_id().cast("long").as("gid"))
      .orderBy(col("gid").asc,
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** A29: explicit GROUPING SETS — the mixed-set form cube/rollup can't
    * express: (status × priority), (status), (priority) — note NO grand
    * total. Same plan family (one Expand + one aggregation); grouping_id
    * disambiguates subtotal rows from real NULL keys, as in q77. */
  def q92GroupingSets(t: Tables): DataFrame =
    t.orders
      .groupingSets(
        Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderstatus")), Seq(col("o_orderpriority"))),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(money(sum(dec(col("o_totalprice")))).as("total"),
           count(lit(1)).as("n_orders"),
           grouping_id().cast("long").as("gid"))
      .orderBy(col("gid").asc,
        col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** A17: CTE pipeline — monthly revenue, then month-over-month growth. */
  def q17Cte(t: Tables): DataFrame = {
    val monthly = t.orders
      .groupBy(date_trunc("month", col("o_orderdate")).as("month_start"))
      .agg(sum(dec(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy("month_start")
    monthly
      .select(col("month_start"), col("rev_dec"), lag(col("rev_dec"), 1).over(w).as("prev_dec"))
      .filter(col("prev_dec").isNotNull && col("rev_dec") > col("prev_dec"))
      .select(col("month_start"), money(col("rev_dec")).as("revenue"), money(col("prev_dec")).as("prev_revenue"))
      .orderBy("month_start")
  }

  /** A19: pivot — order counts per priority × status. The status values
    * are an explicit list, so there is NO driver-side distinct-value
    * discovery pass (the default `pivot(col)` runs one); at 100 TB the
    * whole thing is a single partial-aggregated shuffle. */
  def q19Pivot(t: Tables): DataFrame =
    t.orders.groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .count()
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))
      .orderBy("o_orderpriority")

  /** A20: exact percentiles of order value by status. `percentile` is a
    * sort-based exact aggregate (matches DuckDB quantile_cont bit-for-bit
    * — same linear interpolation); at 100 TB swap in approx_percentile
    * (t-digest) for the same query shape with bounded executor memory. */
  def q45Percentiles(t: Tables): DataFrame =
    t.orders.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5D)").as("p50"),
           expr("percentile(o_totalprice, 0.9D)").as("p90"),
           expr("percentile(o_totalprice, 0.99D)").as("p99"),
           count(lit(1)).as("n"))
      .orderBy("o_orderstatus")

  /** A23: approximate percentiles with their accuracy contract as the
    * oracle, stated in RANK space — the native form of the GK guarantee:
    * the returned value's exact rank window [#(x<v)+1, #(x≤v)] must
    * intersect [qn−εn−1, qn+εn+1] with ε = 1/accuracy (±1 element of
    * slack absorbs the floor/ceil target-rank convention). Rank-space
    * avoids the small-n fragility of converting ε to VALUE bounds via
    * interpolated percentiles (at εn < 1 row the interpolated window is
    * narrower than one inter-element gap and a perfectly in-contract
    * sketch answer can fall outside it). Sketch internals differ across
    * engines, so (like q60's HLL oracle) the booleans are pinned TRUE on
    * the DuckDB side and exact p50/p90 anchor the values; the 100 TB path
    * is the sketch (mergeable partial aggs, bounded memory). */
  def q63ApproxPercentile(t: Tables): DataFrame = {
    val eps = 0.001 // accuracy 1000
    val ap = t.orders.groupBy("o_orderstatus")
      .agg(expr("approx_percentile(o_totalprice, array(0.5D, 0.9D), 1000)").as("ap"))
      .select(col("o_orderstatus"), col("ap")(0).as("ap50"), col("ap")(1).as("ap90"))
    def rankOk(q: Double, lt: org.apache.spark.sql.Column, le: org.apache.spark.sql.Column,
               n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (lt + lit(1) <= lit(q) * n + lit(eps) * n + lit(1)) && (le >= lit(q) * n - lit(eps) * n - lit(1))
    t.orders.join(broadcast(ap), "o_orderstatus")
      .groupBy("o_orderstatus")
      .agg(
        count(when(col("o_totalprice") < col("ap50"), 1)).as("lt50"),
        count(when(col("o_totalprice") <= col("ap50"), 1)).as("le50"),
        count(when(col("o_totalprice") < col("ap90"), 1)).as("lt90"),
        count(when(col("o_totalprice") <= col("ap90"), 1)).as("le90"),
        expr("percentile(o_totalprice, 0.5D)").as("p50_exact"),
        expr("percentile(o_totalprice, 0.9D)").as("p90_exact"),
        count(lit(1)).as("n"))
      .select(
        col("o_orderstatus"),
        rankOk(0.5, col("lt50"), col("le50"), col("n")).as("p50_rank_ok"),
        rankOk(0.9, col("lt90"), col("le90"), col("n")).as("p90_rank_ok"),
        col("p50_exact"), col("p90_exact"), col("n"))
      .orderBy("o_orderstatus")
  }

  /** A21: date-spine densification — month grid × left join so empty
    * months surface as zeros (reporting's classic gap-fill). The spine is
    * generated (sequence+explode), never read; the fact side aggregates
    * BEFORE the join so the spine join touches one row per month. */
  def q56DateSpine(t: Tables): DataFrame = {
    val spark = t.orders.sparkSession
    import spark.implicits._
    val spine = Seq(1).toDF("__one").select(
      explode(expr(
        "sequence(timestamp'1995-01-01', timestamp'2001-12-01', interval 1 month)"))
        .as("month_start"))
    val monthly = t.orders
      .filter(col("o_orderstatus") === "F")
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("cnt"))
    spine.join(monthly, col("month_start") === col("m"), "left_outer")
      .select(col("month_start"), coalesce(col("cnt"), lit(0L)).as("n_orders"))
      .orderBy("month_start")
  }

  /** A22: ordered string aggregation — per customer, order priorities of
    * recent orders as one sorted comma list (listagg/string_agg shape).
    * sort_array(collect_list(...)) gives a DETERMINISTIC order regardless
    * of partition arrival order — unordered collect_list is not
    * reproducible and would fail any cross-engine compare. */
  def q57StringAgg(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") >= lit("2001-06-01").cast("timestamp"))
      .groupBy("o_custkey")
      .agg(concat_ws(",", sort_array(collect_list(col("o_orderpriority")))).as("prios"),
           count(lit(1)).as("n"))
      .orderBy("o_custkey")

  /** A24: window-frame zoo — ntile/percent_rank/cume_dist plus RANGE and
    * bounded-ROWS frames (first/last/moving aggregates). Frames change
    * WHAT is aggregated, not the plan shape: one hash-partitioned window
    * pass per partition spec, same as q08. Ties: every order key includes
    * o_orderkey, so ranks and frame contents are total orders and both
    * engines agree exactly. */
  def q72WindowFrames(t: Tables): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val rows3 = byCust.rowsBetween(-2, Window.currentRow)
    val toHere = byCust.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    t.orders
      .filter(col("o_custkey") <= 300)
      .select(
        col("o_custkey"), col("o_orderkey"),
        ntile(4).over(byCust).cast("long").as("quartile"),
        percent_rank().over(byCust).as("pct_rank"),
        cume_dist().over(byCust).as("cume"),
        first(col("o_orderkey")).over(byCust).as("first_key"),
        money(min(dec(col("o_totalprice"))).over(toHere)).as("min_so_far"),
        money(sum(dec(col("o_totalprice"))).over(rows3)).as("moving3_sum"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** A25: lateral explode — one row per (order, priority-tag) pair via
    * posexplode over a computed array, nulls preserved with _outer. The
    * generator runs inside the same stage as the scan (no shuffle added);
    * the oracle replays it with UNNEST WITH ORDINALITY. */
  def q73LateralExplode(t: Tables): DataFrame =
    t.orders
      .filter(col("o_custkey") <= 100)
      .select(col("o_orderkey"),
        posexplode_outer(when(col("o_orderstatus") === "F",
          array(col("o_orderpriority"), col("o_orderstatus"))))
          .as(Seq("pos", "tag")))
      .select(col("o_orderkey"), col("pos").cast("long").as("pos"), col("tag"))
      .orderBy(col("o_orderkey"), col("pos").asc_nulls_first)

  /** A18: latest-row-per-key — THE reverse-ETL dedup (one row per entity). */
  def q18LatestPerKey(t: Tables): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .orderBy("o_custkey")
  }

  /** A27: FULL OUTER join — period-over-period comparison where entities
    * can exist on either side only (customers active in 1997, 1998, or
    * both). Joining with `Seq(key)` gives USING semantics: the key is
    * coalesced, matching DuckDB's FULL JOIN ON + COALESCE replay.
    *
    * Scale: both inputs are aggregates ON the join key, so the full-outer
    * join reuses the aggregation's hash partitioning — one shuffle per
    * side, zero extra exchanges, and no broadcast (full outer can't
    * broadcast: both sides must surface unmatched rows). */
  def q79FullOuter(t: Tables): DataFrame = {
    def rev(yr: Int) =
      t.orders.filter(year(col("o_orderdate")) === yr)
        .groupBy("o_custkey")
        .agg(money(sum(dec(col("o_totalprice")))).as(s"rev_$yr"),
             count(lit(1)).as(s"n_$yr"))
    rev(1997).join(rev(1998), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("rev_1997"), lit(0.0)).as("rev_1997"),
        coalesce(col("n_1997"), lit(0L)).as("n_1997"),
        coalesce(col("rev_1998"), lit(0.0)).as("rev_1998"),
        coalesce(col("n_1998"), lit(0L)).as("n_1998"),
        when(col("n_1997").isNotNull && col("n_1998").isNotNull, lit("both"))
          .when(col("n_1997").isNotNull, lit("only_1997"))
          .otherwise(lit("only_1998")).as("presence"))
      .orderBy("o_custkey")
  }

  /** A28: LOCF gap-fill — densify a per-(series, day) aggregate onto a
    * full day spine and forward-fill missing days with the last observed
    * value (`last(_, ignoreNulls = true)` over an unbounded-preceding
    * frame = IGNORE NULLS last_value). Days before a series' first
    * observation stay NULL; `carried` marks filled rows.
    *
    * Scale: the window partitions by series over the SPINE (days ×
    * series — bounded by calendar size, not data size), never over raw
    * events; the raw scan only feeds a partial-aggregated groupBy. This
    * is the pre-aggregate-then-window pattern q56/q17 use. */
  def q80GapFill(t: Tables): DataFrame = {
    val ev = t.events.select(col("event_type"),
      expr("ts div 86400000000000").as("day"), col("value"))
    val daily = ev.groupBy("event_type", "day")
      .agg(money(sum(dec(col("value")))).as("obs"))
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        last(col("obs"), ignoreNulls = true).over(w).as("value_filled"),
        col("obs").isNull.as("carried"))
      .orderBy("event_type", "day")
  }

  /** A40: LINEAR-interpolated gap fill — the numeric complement of A28's
    * LOCF: a missing day gets the time-weighted blend of its bracketing
    * observations instead of a stale carry-forward (the right call for
    * continuous metrics — balances, rates — where LOCF fabricates
    * plateaus). Both neighbors come from the SAME two one-pass windows
    * LOCF uses (last/first ignoreNulls, preceding/following frame) — no
    * self-join, no per-gap explode. Exactness: observations become cents
    * (exact decimal→long), the blend c0·(nd−day)+c1·(day−pd) is integer,
    * and ONE final IEEE division by (nd−pd)·100 lands the double — both
    * engines perform the identical single rounding. Days outside the
    * observed range report kind='edge' with NULL (interpolation has no
    * bracketing pair there; extrapolation is a policy, not a default). */
  def q167InterpFill(t: Tables): DataFrame = {
    val ev = t.events.select(col("event_type"),
      expr("ts div 86400000000000").as("day"), col("value"))
    val daily = ev.groupBy("event_type", "day")
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    val bounds = ev.agg(min("day").as("d0"), max("day").as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wPrev = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("cents"),
        last(col("cents"), ignoreNulls = true).over(wPrev).as("c0"),
        last(when(col("cents").isNotNull, col("day")), ignoreNulls = true)
          .over(wPrev).as("pd"),
        first(col("cents"), ignoreNulls = true).over(wNext).as("c1"),
        first(when(col("cents").isNotNull, col("day")), ignoreNulls = true)
          .over(wNext).as("nd"))
      .select(col("event_type"), col("day"),
        when(col("cents").isNotNull, col("cents").cast("double") / 100)
          .when(col("c0").isNull || col("c1").isNull, lit(null).cast("double"))
          .otherwise(
            (col("c0") * (col("nd") - col("day")) + col("c1") * (col("day") - col("pd")))
              .cast("double") / ((col("nd") - col("pd")) * 100))
          .as("value_interp"),
        when(col("cents").isNotNull, "observed")
          .when(col("c0").isNull || col("c1").isNull, "edge")
          .otherwise("interpolated").as("kind"))
      .orderBy("event_type", "day")
  }

  /** A41: per-metric TREND regression — OLS fit of the daily total against
    * the day index, per event_type: the "is this metric drifting and where
    * will it be tomorrow" question that pairs with D19's anomaly flags
    * (D19 asks "is today surprising", A41 asks "what is the direction").
    * Same exactness recipe as A33's correlation: daily totals become exact
    * cents, ALL five power sums (n, Σx, Σy, Σxy, Σx²(+Σy² for R²)) are
    * exact decimals from one bounded-key aggregation over the tiny per-day
    * frame, and slope/intercept/R²/forecast are a fixed tree of IEEE
    * double ops both engines evaluate identically. Scale: the regression
    * runs on the PRE-AGGREGATED (type, day) frame — corpus size only
    * touches the first map-side-partial groupBy. */
  def q168TrendRegression(t: Tables): DataFrame = {
    val big = org.apache.spark.sql.types.DecimalType(38, 0)
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    val daily = t.events
      .select(col("event_type"), expr("ts div 86400000000000").as("day"),
        col("value"))
      .groupBy("event_type", "day")
      .agg((sum(dec(col("value"))) * 100).cast(big).as("y"))
      .withColumn("x", col("day").cast(big))
    val s = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"), max(col("day")).as("d1"))
    // stage the shared double subtrees ONCE (num/den/deny, then slope,
    // then intercept) — the oracle mirrors the same staging CTE-for-CTE,
    // so each IEEE value is computed a single identical way on both sides
    s.withColumn("num", d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy")))
      .withColumn("den", d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx")))
      .withColumn("deny", d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))
      .withColumn("slope_per_day", col("num") / col("den") / 100.0)
      .withColumn("intercept",
        (d(col("sy")) / 100.0 - col("slope_per_day") * d(col("sx"))) / d(col("n")))
      .select(col("event_type"), col("n"), col("slope_per_day"), col("intercept"),
        (col("num") * col("num") / (col("den") * col("deny"))).as("r2"),
        (col("intercept") + col("slope_per_day") * (d(col("d1")) + 1.0))
          .as("forecast_next_day"))
      .orderBy("event_type")
  }

  /** A42: TIME-WEIGHTED average over irregular observations — the honest
    * mean for step-function metrics (balances, inventory levels, plan
    * tiers): a plain AVG over observation rows overweights densely
    * sampled stretches; the time-weighted form holds each daily
    * observation for the days until the next one (the step-function
    * integral, LOCF's aggregate face — A28 fills the series, this
    * integrates it). Each observation's weight = gap to the next (lead;
    * the last holds 1 day); integral and span are exact integers from ONE
    * window pass over the tiny (type, day) frame, and both averages are
    * single IEEE divisions mirrored in the oracle. Corpus size touches
    * only the daily pre-aggregation. */
  def q173TimeWeightedAvg(t: Tables): DataFrame = {
    val daily = t.events
      .select(col("event_type"), expr("ts div 86400000000000").as("day"), col("value"))
      .groupBy("event_type", "day")
      .agg((sum(dec(col("value"))) * 100).cast("long").as("cents"))
    val w = Window.partitionBy("event_type").orderBy("day")
    daily
      .withColumn("w_days", coalesce(lead(col("day"), 1).over(w) - col("day"), lit(1L)))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_obs"),
        (max(col("day")) - min(col("day")) + 1).as("span_days"),
        sum(col("cents") * col("w_days")).as("__integral"),
        sum(col("cents")).as("__plain"))
      .select(col("event_type"), col("n_obs"), col("span_days"),
        (col("__integral").cast("double") / (col("span_days") * 100).cast("double"))
          .as("time_weighted_avg"),
        (col("__plain").cast("double") / (col("n_obs") * 100).cast("double"))
          .as("plain_avg"))
      .orderBy("event_type")
  }

  /** A30: UNPIVOT / melt — wide per-group measures to long (group,
    * measure, value) form, the shape BI export and destination-schema
    * mapping want. Spark's `unpivot` plans as a generator (Expand) fused
    * into the same stage as its input: fan-out = #measures per row, NO
    * shuffle of its own. Here it melts a pre-aggregated 6-row frame;
    * melting a raw fact table costs the same — one Expand, rows ×
    * measures out. All measures share one exact decimal type before the
    * melt (unpivot requires a common value type; final cast to double). */
  def q94Unpivot(t: Tables): DataFrame = {
    val wide = t.lineitem
      .filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"),
           sum(dec(col("l_extendedprice"))).as("sum_price"),
           sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"))
    wide.unpivot(
        ids = Array(col("l_returnflag"), col("l_linestatus")),
        values = Array(col("sum_qty"), col("sum_price"), col("sum_disc_price")),
        variableColumnName = "measure", valueColumnName = "value")
      .select(col("l_returnflag"), col("l_linestatus"), col("measure"),
        money(col("value")).as("value"))
      .orderBy("l_returnflag", "l_linestatus", "measure")
  }

  /** A31: equi-width numeric HISTOGRAM (distribution profiling — the
    * pre-sync audit and data-quality shape). Bucket assignment is pure
    * integer arithmetic on exact cents (`floor(price·100) div width`),
    * so both engines bin identically — no float boundary hazard; one
    * map-side-partial groupBy on a bounded key space (#buckets), the
    * cheapest possible shuffle. Out-of-range clamping = width_bucket
    * semantics with closed edge buckets. */
  def q95Histogram(t: Tables): DataFrame = {
    val widthCents = 500000L // 5000.00 per bucket
    // exact cents: DECIMAL(18,2) * 100 is integral, so the long cast is lossless
    val cents = (dec(col("l_extendedprice")) * 100).cast("long")
    t.lineitem
      .select(least(greatest(cents, lit(0L)), lit(15999999L)).as("__c"))
      .select(expr(s"__c div $widthCents").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), (col("bucket") * lit(5000L)).as("bucket_lo"), col("n"))
      .orderBy("bucket")
  }

  /** A37: hierarchical closure — the recursive-CTE workload over a
    * synthetic fanout-7 forest on doc ids (parent = id div 7), closed by
    * path doubling in ⌈log₂ depth⌉ joins; the oracle runs DuckDB's REAL
    * `WITH RECURSIVE` — two entirely different evaluation strategies
    * required to agree row-for-row. */
  def q155Hierarchy(t: Tables): DataFrame = {
    val edges = t.documents.select(col("doc_id").as("child"),
      expr("doc_id div 7").as("parent"))
    graft.operators.Hierarchy.ancestors(edges, "child", "parent")
      .orderBy("node", "depth")
  }

  /** A36: MAD robust-outlier audit — median absolute deviation per group,
    * the ROBUST complement of A34's winsorize: median and MAD survive the
    * very outliers that drag mean/stddev (and so the p05/p95 clip points)
    * toward themselves, so `|x − med| > 5·MAD` flags extreme rows without
    * the estimator itself being contaminated. Two exact percentile passes
    * by nature (med, then the deviation median) — each pass is one
    * partial-aggregated scan with the tiny per-group frame broadcast
    * back; flagged totals in exact decimal. */
  def q149MadOutliers(t: Tables): DataFrame = {
    val med = t.lineitem.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5D)").as("med"))
    val dev = t.lineitem.select(col("l_returnflag"), col("l_extendedprice"))
      .join(broadcast(med), "l_returnflag")
      .withColumn("adev", abs(col("l_extendedprice") - col("med")))
    val mad = dev.groupBy("l_returnflag")
      .agg(expr("percentile(adev, 0.5D)").as("mad"), max(col("med")).as("med"))
    dev.drop("med").join(broadcast(mad), "l_returnflag")
      .select(col("l_returnflag"), col("med"), col("mad"),
        (col("adev") > lit(5.0) * col("mad")).as("flag"),
        col("l_extendedprice"))
      .groupBy("l_returnflag")
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(lit(1)).as("n"),
        sum(when(col("flag"), 1L).otherwise(0L)).as("n_outliers"),
        money(sum(when(col("flag"), dec(col("l_extendedprice")))
          .otherwise(lit(0).cast(Dec)))).as("outlier_total"))
      .orderBy("l_returnflag")
  }

  /** A35: EQUI-DEPTH histogram — the statistics-build complement of q95's
    * equi-width buckets (what an optimizer's column statistics and a
    * partition-balancing planner actually want: every bucket holds the
    * same row count, bucket BOUNDS move with the data): row's bucket =
    * (rank−1)·k div n over the exact total value order.
    *
    * Scale: the global rank is the TWO-LEVEL distributed form (value-range
    * buckets on exact cents → local row_number per range + cumulated
    * range totals broadcast back — identical to the one global window,
    * spec-pinned in PlanSpec's family), never a full single-task sort;
    * the total n rides a 1-row broadcast; output is k rows with exact
    * cent bounds. */
  def q148EquiDepth(t: Tables): DataFrame = {
    val k = 16
    val cents = (dec(col("l_extendedprice")) * 100).cast("long")
    val base = t.lineitem.select(cents.as("c"),
        col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
      .withColumn("rb", expr("c div 1000000"))
    val wLocal = Window.partitionBy("rb")
      .orderBy(col("c"), col("ok"), col("ln"))
    val wRanges = Window.orderBy("rb")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = base.groupBy("rb").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum(col("bn")).over(wRanges), lit(0L)))
      .select("rb", "off")
    val total = base.agg(count(lit(1)).as("n_total"))
    base.withColumn("lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), "rb")
      .crossJoin(broadcast(total))
      .select(expr(s"(off + lrn - 1) * $k div n_total").as("bucket"), col("c"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("c")).as("lo_cents"), max(col("c")).as("hi_cents"))
      .orderBy("bucket")
  }

  /** A34: percentile WINSORIZATION — the outlier-clipping cleanup step:
    * clamp a measure into its exact per-group [p05, p95] band and report
    * rows clipped + the winsorized total. Two passes by nature (exact
    * percentiles need a full pass before clipping — the single-pass
    * variant is C19's mergeable quantile sketch with the same query
    * shape); the tiny per-group percentile frame broadcasts back. The
    * oracle replays clamp and decimal totals exactly (q45 already pins
    * Spark percentile == DuckDB quantile_cont). */
  def q121Winsorize(t: Tables): DataFrame = {
    val pcts = t.lineitem.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.05D)").as("p05"),
           expr("percentile(l_extendedprice, 0.95D)").as("p95"))
    t.lineitem.select("l_returnflag", "l_extendedprice")
      .join(broadcast(pcts), "l_returnflag")
      .select(col("l_returnflag"),
        when(col("l_extendedprice") < col("p05") ||
             col("l_extendedprice") > col("p95"), 1L).otherwise(0L).as("clipped"),
        greatest(least(col("l_extendedprice"), col("p95")), col("p05")).as("wv"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("clipped")).as("n_clipped"),
           money(sum(dec(col("wv")))).as("winsorized_total"))
      .orderBy("l_returnflag")
  }

  /** A33: correlation / covariance profile (the "do these two measures
    * move together" audit) — Pearson r and sample covariance per group,
    * computed from EXACT decimal power sums (n, Σx, Σy, Σxy, Σx², Σy² on
    * integer cents; associative, partition-order-proof — the built-in
    * corr() aggregates doubles in partition order and is not
    * cross-engine reproducible) with one double-arithmetic read-out both
    * engines evaluate identically. One map-side-partial pass. */
  def q112Correlation(t: Tables): DataFrame = {
    val cents = org.apache.spark.sql.types.DecimalType(18, 0)
    val x = (dec(col("l_extendedprice")) * 100).cast(cents)
    val y = (dec(col("l_quantity")) * 100).cast(cents)
    val d = (c: org.apache.spark.sql.Column) => c.cast("double")
    t.lineitem
      .select(col("l_returnflag"), x.as("x"), y.as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("l_returnflag"), col("n"),
        ((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
           sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))))
          .as("corr_price_qty"),
        ((d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))) /
          (d(col("n")) - 1) / 10000.0).as("cov_samp"),
        (d(col("sx")) / 100.0 / d(col("n"))).as("avg_price"),
        (d(col("sy")) / 100.0 / d(col("n"))).as("avg_qty"))
      .orderBy("l_returnflag")
  }

  /** A32: multiple COUNT(DISTINCT) columns in one aggregation — the audit
    * query shape ("how many customers, clerks, dates per segment").
    * Catalyst plans N distinct aggregates as ONE Expand (row × N) + a
    * two-level aggregate, not N self-joins or N scans: one pass over the
    * fact table at any scale, with the non-distinct aggregates (count,
    * decimal sum) riding the same Expand. */
  def q108MultiDistinct(t: Tables): DataFrame =
    t.orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           countDistinct(col("o_orderstatus")).as("n_statuses"),
           countDistinct(year(col("o_orderdate"))).as("n_years"),
           count(lit(1)).as("n_orders"),
           money(sum(dec(col("o_totalprice")))).as("total"))
      .orderBy("o_orderpriority")
}
