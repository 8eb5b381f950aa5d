package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.Q._

/**
 * §2B — the reverse-ETL primitives: the reference's own data semantics
 * (cursor-incremental reads, snapshot diff, audience hashing, validation,
 * batching, upsert-key resolution) re-expressed as set-oriented Spark plans.
 *
 * Reference behaviors (studied, not ported):
 *  - cursor sync: core/src/commands/sync.ts:553-605 — filter rows past the
 *    persisted cursor, verify monotone order, track max(cursor).
 *  - audience hash: connectors/facebook-ads/src/index.ts:86-118 —
 *    sha256(lower(email)), 1000-row batches.
 *  - diff vs last sync: the reference replays per-row keys from its KV
 *    store; at scale that is a snapshot full-outer join + content compare.
 *  - validation: core/src/lib/error-threshold.ts — per-row validity.
 *  - upsert-key maps: connectors/intercom/src/index.ts:149-168 —
 *    external-id → internal-id resolution decides create vs update.
 *
 * All arithmetic used in oracle-checked outputs is engine-portable
 * (decimal-exact money, bigint counts, string ops with identical semantics
 * in Spark and DuckDB).
 */
object ReverseEtl {

  /** The cursor value a sync would have persisted from its previous run.
    * Fixed here so the query is deterministic and oracle-checkable. */
  val LastCursor = "1997-06-01"

  /** B1 operator: incremental read — rows strictly past the cursor. The
    * reference only asserts monotone cursor ARRIVAL, which the runner gets
    * from checkpoint semantics — so the operator does NOT sort: a global
    * order-by here is a full range-shuffle whose only consumer would be
    * the oracle comparator. */
  def cursorIncrement(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") > lit(LastCursor).cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

  /** B1 harness wrapper: the driver's compare is positional, so the DUMP
    * (and only the dump) gets a total order. */
  def q20CursorIncremental(t: Tables): DataFrame =
    cursorIncrement(t).orderBy(col("o_orderdate").asc, col("o_orderkey").asc)

  /** B2: checkpoint value — max(cursor) + row count of the increment.
    * A full agg, partial map-side; one row out regardless of input size. */
  def q21MaxCursor(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") > lit(LastCursor).cast("timestamp"))
      .agg(max(col("o_orderdate")).as("last_cursor"),
           count(lit(1)).as("n_rows"))

  // --- snapshot diff fixtures -----------------------------------------
  // "Previous" and "current" sync snapshots derived deterministically from
  // orders, so both engines can reconstruct them:
  //  - prev: state as of 1997-07-01; orders after 1997-01-01 were still
  //    open ('O') back then → those rows now differ (updates).
  //  - curr: every 97th key has since been archived → deletes; rows after
  //    the prev horizon are inserts.
  private def prevSnapshot(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"), lit("O"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"))

  private def currSnapshot(t: Tables): DataFrame =
    t.orders
      .filter(col("o_orderkey") % 97 =!= 0)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")

  /** B3: CDC snapshot diff — full-outer join prev vs curr on the key,
    * classify insert/update/delete by null-safe content compare. At 100 TB
    * both snapshots are bucketed by key → sort-merge join, no re-shuffle;
    * unchanged rows (the vast majority) are dropped before any downstream
    * work. */
  def q22SnapshotDiff(t: Tables): DataFrame = {
    val prev = prevSnapshot(t).select(
      col("o_orderkey").as("p_key"), col("o_custkey").as("p_custkey"),
      col("o_orderstatus").as("p_status"), col("o_totalprice").as("p_price"))
    val curr = currSnapshot(t)
    curr.join(prev, col("o_orderkey") === col("p_key"), "full_outer")
      .select(
        coalesce(col("o_orderkey"), col("p_key")).as("key"),
        when(col("p_key").isNull, "insert")
          .when(col("o_orderkey").isNull, "delete")
          .when(!(col("o_custkey") <=> col("p_custkey")) ||
                !(col("o_orderstatus") <=> col("p_status")) ||
                !(col("o_totalprice") <=> col("p_price")), "update")
          .otherwise("unchanged").as("change_type"))
      .filter(col("change_type") =!= "unchanged")
      .orderBy("key")
  }

  /** B4: deleted-keys detection — the audience-clearing primitive: keys in
    * the previous snapshot absent from the current one (left anti join). */
  def q23DeletedKeys(t: Tables): DataFrame =
    prevSnapshot(t).select("o_orderkey")
      .join(currSnapshot(t).select(col("o_orderkey").as("c_key")),
            col("o_orderkey") === col("c_key"), "left_anti")
      .orderBy("o_orderkey")

  /** B5: audience hashing — fb/twitter custom-audience shape:
    * sha256(lower(email)), email derived deterministically from c_name. */
  def q24AudienceHash(t: Tables): DataFrame =
    t.customer
      .select(col("c_custkey"),
        concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com")).as("email"))
      .select(col("c_custkey"), col("email"), sha2(col("email"), 256).as("hashed_email"))
      .orderBy("c_custkey")

  /** B6: row validation — schema/business rules evaluated per row, with a
    * machine-readable reason; the 20%/100-row abort gate consumes the
    * aggregated counts (see sync.ErrorThreshold). */
  def q25ValidateSplit(t: Tables): DataFrame =
    t.orders
      .select(col("o_orderkey"),
        when(col("o_custkey").isNull, "missing_key")
          .when(!col("o_orderstatus").isin("O", "F", "P"), "bad_status")
          .when(col("o_totalprice") <= 0 || col("o_totalprice") > 300000, "price_range")
          .otherwise(lit(null).cast("string")).as("reject_reason"))
      .withColumn("is_valid", col("reject_reason").isNull)
      .orderBy("o_orderkey")

  /** B7: column mapping to a destination schema — rename, case-fold,
    * type-coerce: the connector "column mapping" step as a pure projection
    * (zero shuffle, fully codegen'd). */
  def q26ColumnMap(t: Tables): DataFrame =
    t.customer
      .select(
        col("c_custkey").cast("string").as("external_id"),
        lower(regexp_replace(col("c_name"), "#", "-")).as("display_name"),
        money(dec(col("c_acctbal"))).as("balance"),
        col("c_nationkey").cast("long").as("nation_id"),
        lower(col("c_mktsegment")).as("segment"))
      .orderBy("external_id")

  /** B8: batch-id assignment — the fb 1000-row batch shape, via the
    * salted scheme: order status is only a 3-value stream, so the naive
    * per-stream window is 3 near-global sort tasks. Salting on the order
    * key bounds every window partition at ~n/(3·16) rows while staying
    * deterministic enough for an exact DuckDB replay. */
  def q27Batcher(t: Tables): DataFrame =
    graft.sinks.Payloads.assignBatchesSalted(
        t.orders.select("o_orderkey", "o_orderstatus"), batchSize = 1000,
        streamCol = col("o_orderstatus"), orderCol = col("o_orderkey"),
        saltKey = col("o_orderkey"), salts = 16)
      .orderBy("o_orderstatus", "o_orderkey")

  /** B9: enrichment — row → rows expansion (the reference calls a side
    * service per row; set-side this is a join that multiplies matching
    * rows and keeps non-matching input rows intact). */
  def q28Enrich(t: Tables): DataFrame =
    t.customer
      .join(t.orders.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
              .select("o_custkey", "o_orderkey", "o_totalprice"),
            col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              money(dec(col("o_totalprice"))).as("order_value"))
      .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)

  /** B21: Bloom-prefiltered audience semi join — restrict the order
    * stream to an audience key set (BUILDING-segment customers) with a
    * broadcast Bloom filter BEFORE the shuffle, then the exact semi join.
    * The result is EXACTLY the plain semi join (false positives die in the
    * join), which is what the oracle replays as ANSI EXISTS; at 100 TB
    * the win is that the fact-side shuffle carries only probable members. */
  def q66BloomPrefilter(t: Tables): DataFrame = {
    val audience = t.customer.filter(col("c_mktsegment") === "BUILDING")
    graft.operators.BloomJoin
      .bloomSemiJoin(t.orders, audience, "o_custkey", "c_custkey",
        expectedItems = 100000L, numBits = 1048576L)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
           money(sum(dec(col("o_totalprice")))).as("total_value"))
      .orderBy("o_orderpriority")
  }

  /** B10: upsert-key resolution — join rows against the external→internal
    * id map (the reference keeps this map in its KV store; at scale it is
    * a broadcastable table). Unmapped rows are creates, mapped are
    * updates. */
  def q29UpsertKeys(t: Tables): DataFrame = {
    val idMap = t.customer
      .filter(col("c_custkey") % 3 =!= 0)
      .select(col("c_custkey").as("m_external_id"),
              ((col("c_custkey") * 2654435761L) % 1000000007L).as("internal_id"))
    t.customer
      .join(broadcast(idMap), col("c_custkey") === col("m_external_id"), "left_outer")
      .select(col("c_custkey").as("external_id"), col("internal_id"),
        when(col("internal_id").isNull, "create").otherwise("update").as("op"))
      .orderBy("external_id")
  }

  /** B16: source column profile — the pre-sync audit every pipeline runs
    * before trusting a model (row count, null rates, distincts, ranges).
    * One pass, all partial aggregates; at 100 TB swap the exact distincts
    * for the C16 sketches with the same query shape. */
  def q47ColumnProfile(t: Tables): DataFrame =
    t.orders.agg(
      count(lit(1)).as("n_rows"),
      count(when(col("o_custkey").isNull, 1)).as("custkey_nulls"),
      countDistinct(col("o_custkey")).as("custkey_distinct"),
      countDistinct(col("o_orderstatus")).as("status_distinct"),
      money(min(dec(col("o_totalprice")))).as("price_min"),
      money(max(dec(col("o_totalprice")))).as("price_max"),
      min(col("o_orderdate")).as("date_min"),
      max(col("o_orderdate")).as("date_max"))

  /** B23: audience MEMBERSHIP delta — the incremental custom-audience
    * sync: the audience is "customers active in the window"; comparing
    * the previous window's membership against the current one yields the
    * add/remove operations the destination actually needs (O(churn), not
    * O(audience)). Payload (the sha256 identifier, q24's shape) joins in
    * AFTER the delta, so full-member payloads are never materialized. */
  def q89AudienceDiff(t: Tables): DataFrame = {
    val prev = t.orders.filter(col("o_orderdate") < lit("1997-01-01")).select("o_custkey")
    val cur = t.orders.filter(col("o_orderdate") >= lit("1996-01-01")).select("o_custkey")
    val delta = graft.operators.Diff.membershipDiff(cur, prev, "o_custkey")
    val ids = t.customer.select(col("c_custkey"),
      sha2(concat(lower(regexp_replace(col("c_name"), "#", ".")), lit("@example.com")), 256)
        .as("hashed_email"))
    delta.join(ids, delta("o_custkey") === ids("c_custkey"))
      .select(col("c_custkey"), col("hashed_email"), col("op"))
      .orderBy("c_custkey")
  }

  /** B24: incremental aggregate maintenance — history state + delta state
    * merge; the oracle computes the ONE-SHOT aggregate over everything,
    * so a hash match proves the merge law exactly (decimal sums are
    * associative; avg derives from exact state at read-out). */
  def q90IncrementalAgg(t: Tables): DataFrame = {
    import graft.operators.IncrementalAgg
    val keys = Seq("o_orderpriority")
    val hist = t.orders.filter(col("o_orderdate") < lit("1997-07-01"))
    val delta = t.orders.filter(col("o_orderdate") >= lit("1997-07-01"))
    val merged = IncrementalAgg.merge(keys,
      IncrementalAgg.buildState(hist, keys, "o_totalprice"),
      IncrementalAgg.buildState(delta, keys, "o_totalprice"))
    IncrementalAgg.readout(merged, keys).orderBy("o_orderpriority")
  }

  /** B39: incremental JOIN maintenance — the enriched view (orders ⋈
    * customer segment) maintained from a fact delta, deleted fact keys
    * and the dim's changed-key set (B3's diff output), never re-joining
    * fact history; must equal the one-shot recompute the oracle runs. */
  def q150IncrementalJoin(t: Tables): DataFrame = {
    import graft.operators.Diff
    val cutoff = lit("1997-07-01").cast("timestamp")
    val dimNew = t.customer.select(col("c_custkey"),
      when(col("c_custkey") % 100 === 0, concat(col("c_mktsegment"), lit("_v2")))
        .otherwise(col("c_mktsegment")).as("c_mktsegment"))
    val changedKeys = t.customer.filter(col("c_custkey") % 100 === 0)
      .select("c_custkey")
    val fact = t.orders.select(
      col("o_custkey").as("c_custkey"), col("o_orderkey"),
      col("o_totalprice"), col("o_orderdate"))
    val hist = fact.filter(col("o_orderdate") < cutoff)
    val delta = fact.filter(col("o_orderdate") >= cutoff)
    val deleted = hist.filter(col("o_orderkey") % 1000 === 0).select("o_orderkey")
    // the previously materialized view: history enriched with the OLD dim
    val oldView = hist.join(
      t.customer.select("c_custkey", "c_mktsegment"), Seq("c_custkey"), "left")
    Diff.maintainJoin(oldView, delta, deleted, dimNew, changedKeys,
      factKey = "o_orderkey", dimKey = "c_custkey")
      .select("o_orderkey", "c_custkey", "o_totalprice", "c_mktsegment")
      .orderBy("o_orderkey")
  }

  /** B20: schema-driven validation report — rules GENERATED from a
    * declared row schema (required/type/enum/range/pattern, the zod-style
    * surface sync.ts:557 derives), folded into per-rule failure counts in
    * one partial-aggregated pass. The declaration is the validator. */
  def q61SchemaValidate(t: Tables): DataFrame = {
    import org.apache.spark.sql.types._
    val declared = StructType(Seq(
      StructField("o_orderkey", LongType, nullable = false),
      StructField("o_custkey", IntegerType),            // long in source → try_cast rule
      StructField("o_orderstatus", StringType, nullable = true,
        new MetadataBuilder().putStringArray("enum", Array("F", "O")).build()),
      StructField("o_totalprice", DoubleType, nullable = true,
        new MetadataBuilder().putDouble("minValue", 0.0).putDouble("maxValue", 250000.0).build()),
      StructField("o_orderpriority", StringType, nullable = true,
        new MetadataBuilder().putString("pattern", "^[1-3]-").build())))
    graft.model.SchemaValidation.failureCounts(
      t.orders.select(declared.fieldNames.map(col).toIndexedSeq: _*), declared)
  }

  /** B28: join-key skew profile of orders.o_custkey — the pre-join audit
    * that decides plain shuffle vs AQE splitting vs salting. */
  def q104SkewProfile(t: Tables): DataFrame =
    graft.operators.Skew.keyProfile(t.orders, "o_custkey", topK = 10)

  /** B30: data-quality EXPECTATIONS report — the table-level pre-sync
    * gate (dbt-test shape): uniqueness, non-null, accepted values,
    * freshness in ONE wide aggregate + unpivot; referential integrity as
    * an anti-join count against the customer dimension. The o_custkey
    * uniqueness expectation is expected to FAIL (customers order more
    * than once) — the report reports, the caller gates. */
  def q113Expectations(t: Tables): DataFrame = {
    import graft.model.Expectations._
    report(t.orders,
      local = Seq(
        Unique(Seq("o_orderkey")),
        Unique(Seq("o_custkey")),
        NotNull("o_custkey"),
        AcceptedValues("o_orderstatus", Seq("O", "F", "P")),
        Freshness("o_orderdate", "1998-06-01")),
      fks = Seq(RefIntegrity("o_custkey", "customer.c_custkey",
        t.customer, "c_custkey")))
  }

  /** B32: three-way snapshot merge — bidirectional-sync conflict
    * resolution over deterministic variants of orders: ours edits
    * status for 1997H2+ rows and deletes every 97th key; theirs edits
    * price for every 5th key, deletes every 89th, and only knows rows
    * before 1997-10. Exercises fast-forwards both ways, identical and
    * conflicting double-edits, delete-vs-edit crossovers, and
    * one-sided inserts. */
  def q118ThreeWayMerge(t: Tables): DataFrame = {
    val base = t.orders
      .filter(col("o_orderdate") < lit("1997-07-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val ours = t.orders
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"), lit("O"))
          .otherwise(col("o_orderstatus")).as("o_orderstatus"),
        col("o_totalprice"))
    val theirs = t.orders
      .filter(col("o_orderdate") < lit("1997-10-01").cast("timestamp") &&
              col("o_orderkey") % 89 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    graft.operators.Diff.threeWayMerge(base, ours, theirs, Seq("o_orderkey"))
      .orderBy("o_orderkey")
  }

  /** B29: SCD Type-2 history apply — fold the current snapshot into a
    * versioned dimension history as of 1997-07-01. The history fixture has
    * an open generation (the prev snapshot, valid since 1995) plus an
    * already-closed 1994 generation for every 7th key, so all five paths
    * (closed pass-through, unchanged, update-close+open, soft delete,
    * brand-new key) are exercised and replayed by the oracle. */
  def q105Scd2(t: Tables): DataFrame = {
    val open = prevSnapshot(t)
      .withColumn("valid_from", lit("1995-01-01").cast("timestamp"))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("is_current", lit(true))
    val closedGen = prevSnapshot(t).filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_orderstatus", lit("X"))
      .withColumn("valid_from", lit("1994-01-01").cast("timestamp"))
      .withColumn("valid_to", lit("1995-01-01").cast("timestamp"))
      .withColumn("is_current", lit(false))
    graft.operators.Scd.applyScd2(
        open.unionByName(closedGen), currSnapshot(t), Seq("o_orderkey"),
        effective = lit("1997-07-01").cast("timestamp"))
      .orderBy("o_orderkey", "valid_from")
  }

  /** B45: deletion-request PROPAGATION — the right-to-be-forgotten sweep:
    * requested subject keys (here: customers with deeply negative
    * balances play the request table) cascade through the schema's
    * foreign keys — orders by custkey, then lineitem by the purged
    * orders' keys — as semi joins, and the audit reports per table the
    * purge count plus an exact key checksum (sum/min/max) so a
    * compliance reviewer can verify WHAT was purged without the purged
    * rows themselves surviving in the report. The cascade is join-depth
    * = FK-depth; each level shuffles on its own key, requests usually
    * broadcast. */
  def q166DeletionSweep(t: Tables): DataFrame = {
    val requests = t.customer.filter(col("c_acctbal") < -800)
      .select(col("c_custkey").as("k"))
    val ordersPurged = t.orders
      .join(requests, col("o_custkey") === col("k"), "left_semi")
    val orderKeys = ordersPurged.select(col("o_orderkey").as("ok"))
    val itemsPurged = t.lineitem
      .join(orderKeys, col("l_orderkey") === col("ok"), "left_semi")
    def audit(name: String, df: DataFrame, key: String): DataFrame =
      df.agg(count(lit(1)).as("n_purged"),
          coalesce(sum(col(key)), lit(0L)).as("key_sum"),
          min(col(key)).as("key_min"), max(col(key)).as("key_max"))
        .select(lit(name).as("table_name"), col("n_purged"),
          col("key_sum"), col("key_min"), col("key_max"))
    audit("customer", requests.withColumnRenamed("k", "c_custkey"), "c_custkey")
      .unionByName(audit("orders", ordersPurged, "o_orderkey"))
      .unionByName(audit("lineitem", itemsPurged, "l_orderkey"))
      .orderBy("table_name")
  }

  /** B44: point-in-time dimension read — the q105 history queried at two
    * probe instants (inside the closed 1994 generation; after the 1997
    * apply) through graft.operators.Scd.asOf's half-open membership
    * filter. Each probe returns exactly one version per live key. */
  def q165TimeTravel(t: Tables): DataFrame = {
    val hist = q105Scd2(t)
    def at(p: String) =
      graft.operators.Scd.asOf(hist, lit(p).cast("timestamp"))
        .withColumn("probe", lit(p))
    at("1994-06-01").unionByName(at("1997-08-01"))
      .select(col("probe"), col("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("valid_from"))
      .orderBy("probe", "o_orderkey")
  }

  /** B43: scalar-distribution drift audit — the pre-sync gate that catches
    * an upstream model or pipeline change before bad rows reach a
    * destination (the tabular sibling of C81's embedding drift): bucket
    * `o_totalprice` into fixed 25k-wide bins for a reference period
    * (orders before 1997) vs the current one, compare per-bin per-million
    * shares, and report the per-bin gap plus the overall total-variation
    * distance. Exact integer shares on both engines; one bounded
    * aggregation + two 1-row broadcast scalars — no full-table second
    * pass. */
  def q162DriftAudit(t: Tables): DataFrame = {
    val split = lit("1997-01-01").cast("timestamp")
    val binned = t.orders.select(
      floor(col("o_totalprice") / lit(25000.0)).cast("long").as("bin"),
      when(col("o_orderdate") < split, 1L).otherwise(0L).as("is_old"))
    val perBin = binned.groupBy("bin").agg(
      sum(col("is_old")).as("n_old"),
      sum(lit(1L) - col("is_old")).as("n_new"))
    val totals = binned.agg(
      sum(col("is_old")).as("__told"),
      sum(lit(1L) - col("is_old")).as("__tnew"))
    val shares = perBin.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_old"), col("n_new"),
        expr("n_old * 1000000 div __told").as("share_old_ppm"),
        expr("n_new * 1000000 div __tnew").as("share_new_ppm"))
      .withColumn("gap_ppm", abs(col("share_new_ppm") - col("share_old_ppm")))
    val tvd = shares.agg(expr("sum(gap_ppm) div 2").as("__tvd"))
    shares.crossJoin(broadcast(tvd))
      .withColumnRenamed("__tvd", "tvd_ppm")
      .orderBy("bin")
  }

  /** B47: position-based MULTI-TOUCH attribution (operators/Attribution)
    * — view/click touches credit their next purchase within a 7-day
    * lookback, U-shaped 40/40/20 in exact ppm (conversion-conserving by
    * construction); purchases colliding on (user, µs) merge (summed
    * cents, max event_id) exactly as q128's as-of dedup convention. */
  def q172Attribution(t: Tables): DataFrame = {
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"),
        col("event_type").as("channel"), col("ts_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us")
      .agg(max(col("event_id")).as("conv_id"),
        (sum(dec(col("value"))) * 100).cast("long").as("value_cents"))
      .select(col("user_id"), col("ts_us").as("conv_ts"),
        col("conv_id"), col("value_cents"))
    graft.operators.Attribution.positionBased(touches, conv,
      lookbackUs = 7L * 86400000000L)
  }

  /** B52: time-decay attribution
    * ([[graft.operators.Attribution.timeDecay]], 1-day half-life,
    * 7-day lookback) — the recency-weighted split beside q172's
    * U-shape, per (channel, half-lives-ago) bucket: exact ppm weights
    * 10⁶ div 2^h, per-conversion conservation with the remainder on
    * the most recent touch. */
  def q231TimeDecay(t: Tables): DataFrame = {
    val ev = t.events.withColumn("ts_us", expr("ts div 1000L"))
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("event_id"), col("user_id"),
        col("event_type").as("channel"), col("ts_us"))
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts_us")
      .agg(max(col("event_id")).as("conv_id"),
        (sum(dec(col("value"))) * 100).cast("long").as("value_cents"))
      .select(col("user_id"), col("ts_us").as("conv_ts"),
        col("conv_id"), col("value_cents"))
    graft.operators.Attribution.timeDecay(touches, conv,
      lookbackUs = 7L * 86400000000L, halflifeUs = 86400000000L)
  }

  /** B53: MARKOV removal-effect attribution
    * ([[graft.operators.Attribution.markovRemoval]]) — the data-driven
    * credit model beside the rule-based splits (q172 U-shape, q231
    * time-decay): user journeys split at each purchase become a
    * first-order chain over the event-type channels; a channel's credit
    * is its REMOVAL EFFECT on the 32-sweep integer absorption
    * probability of CONV from START. Every number exact ppm. */
  def q236MarkovAttribution(t: Tables): DataFrame =
    graft.operators.Attribution.markovRemoval(t.events,
      userCol = "user_id", channelCol = "event_type",
      tsCol = "ts", tieCol = "event_id", convChannel = "purchase")

  /** B54: ITEM-TO-ITEM recommendations
    * ([[graft.operators.Recommend.itemToItem]]) — the "people also
    * bought" payload a recommendations destination receives: per part,
    * the top-3 co-ordered parts by exact integer lift (co-occurrence
    * floor 2), ties (n_ab DESC, rec ASC). First 150 rows in (item,
    * rank) order — the deterministic sync batch. The enforced basket
    * cap (1024 — TPC-H orders are ≤ 7 lines, so the oracle-gated
    * ledger columns are provably zero) refuses mega-basket quadratic
    * expansion at any SF. */
  def q245ItemRecs(t: Tables): DataFrame =
    graft.operators.Recommend.itemToItem(
        t.lineitem.select(col("l_orderkey").as("basket"),
          col("l_partkey").as("item")),
        "basket", "item", minPair = 2L, k = 3, maxBasketSize = 1024L)
      .orderBy("item", "rank")
      .limit(150)

  /** B49: REFERENTIAL-INTEGRITY audit — the cross-table data-quality
    * gate next to B30's column-level expectations: before a sync trusts
    * an enrichment join, count every child row whose foreign key has no
    * parent (orphans break joins silently — an inner enrichment DROPS
    * them, a left one NULLs the payload). One anti-join + one count per
    * declared relation, per-mille orphan rate; NULL keys counted
    * separately (a null FK is absent-by-design, an orphan is a broken
    * promise). All five TPC-H-ish relations audited in one frame. */
  /** One relation's integrity frame — public so specs can feed broken
    * fixtures ([[q204ReferentialIntegrity]] composes five of these). */
  def integrityAudit(relation: String, child: DataFrame, key: String,
                     parent: DataFrame, pkey: String): DataFrame = {
    val keys = child.select(col(key).as("k"))
    val p = parent.select(col(pkey).as("pk")).distinct()
    val nTotal = keys.agg(count(lit(1)).as("n_rows"),
      sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_null_keys"))
    val orphans = keys.filter(col("k").isNotNull)
      .join(p, col("k") === col("pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    nTotal.crossJoin(broadcast(orphans))
      .select(lit(relation).as("relation"), col("n_rows"),
        col("n_null_keys"), col("n_orphans"),
        expr("n_orphans * 1000 div n_rows").as("orphans_pm"))
  }

  /** B50: RFM segmentation ([[graft.operators.Rfm.rfmScores]]) — the
    * audience-activation scoring behind "sync the champions segment":
    * recency/frequency/monetary quintiles by exact equal-population rank
    * (deterministic id ties), composed into the segment label the
    * destination receives. Recency anchored at the corpus max order
    * date; money in exact cents. */
  def q224Rfm(t: Tables): DataFrame =
    graft.operators.Rfm.rfmScores(t.orders, "o_custkey",
        col("o_orderdate").cast("date"),
        (Q.dec(col("o_totalprice")) * 100).cast("long"))
      .orderBy("cust")

  /** B51: customer-lifetime Kaplan–Meier survival
    * ([[graft.operators.Survival.kaplanMeier]]) — the censoring-aware
    * lifetime curve behind churn-risk activation: a customer whose last
    * order is > 60 days before the corpus max date has CHURNED at
    * duration last−first; everyone else is CENSORED at ref−first (still
    * at risk — the information a naive average throws away). Exact ppm
    * per-step truncating survival product, event-time frame only. */
  def q229Survival(t: Tables): DataFrame = {
    val per = t.orders.groupBy(col("o_custkey").as("cust"))
      .agg(min(col("o_orderdate").cast("date")).as("first_d"),
        max(col("o_orderdate").cast("date")).as("last_d"))
    val ref = per.agg(max(col("last_d")).as("ref_d"))
    val subj = per.crossJoin(broadcast(ref))
      .withColumn("event", datediff(col("ref_d"), col("last_d")) > 60)
      .withColumn("duration",
        when(col("event"), datediff(col("last_d"), col("first_d")))
          .otherwise(datediff(col("ref_d"), col("first_d"))))
    graft.operators.Survival.kaplanMeier(subj, col("duration"), col("event"))
      .orderBy("t")
  }

  def q204ReferentialIntegrity(t: Tables): DataFrame = {
    def audit(relation: String, child: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame =
      integrityAudit(relation, child, key, parent, pkey)
    audit("lineitem.l_orderkey->orders", t.lineitem, "l_orderkey", t.orders, "o_orderkey")
      .unionByName(audit("lineitem.l_partkey->part", t.lineitem, "l_partkey", t.part, "p_partkey"))
      .unionByName(audit("lineitem.l_suppkey->supplier", t.lineitem, "l_suppkey", t.supplier, "s_suppkey"))
      .unionByName(audit("orders.o_custkey->customer", t.orders, "o_custkey", t.customer, "c_custkey"))
      .unionByName(audit("customer.c_nationkey->nation", t.customer, "c_nationkey", t.nation, "n_nationkey"))
      .orderBy("relation")
  }
}
