package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Generic snapshot diff — the scalable replacement for the reference's
 * row-at-a-time "replay last-synced rows from the KV store" audience diff
 * (connectors/facebook-ads/src/index.ts:143-150).
 *
 * Current and previous snapshots are full tables (parquet); the diff is ONE
 * full-outer join on the key plus a map-side xxhash64 content hash — so
 * only (key, hash) plus changed-row payloads matter. At 100 TB both
 * snapshots are written bucketed by key → the join is a zero-shuffle
 * sort-merge; unchanged rows (the overwhelming majority in steady state)
 * are discarded before anything downstream.
 */
object Diff {

  val ChangeCol = "change_type"

  /** Classified diff of `curr` vs `prev` on `keyCols`. Output: all `curr`
    * columns (payload for insert/update; key + nulls for delete) plus
    * `change_type` ∈ insert|update|delete. Unchanged rows are dropped. */
  def snapshotDiff(curr: DataFrame, prev: DataFrame, keyCols: Seq[String]): DataFrame = {
    val payload = curr.columns.filterNot(keyCols.contains)
    require(payload.sameElements(prev.columns.filterNot(keyCols.contains)),
      s"snapshot schemas differ: ${curr.columns.mkString(",")} vs ${prev.columns.mkString(",")}")

    def hashed(df: DataFrame, hashAs: String, prefix: String): DataFrame =
      df.select(
        keyCols.map(k => col(k).as(s"$prefix$k")) ++
          payload.map(c => col(c).as(s"$prefix$c")) :+
          contentHash(payload.map(col)).as(hashAs): _*)

    val c = hashed(curr, "c_hash", "c_")
    val p = hashed(prev, "p_hash", "p_").select(
      (keyCols.map(k => col(s"p_$k")) :+ col("p_hash")): _*)

    val joinCond = keyCols.map(k => col(s"c_$k") === col(s"p_$k")).reduce(_ && _)
    c.join(p, joinCond, "full_outer")
      .withColumn(ChangeCol,
        when(col("p_hash").isNull, "insert")
          .when(col("c_hash").isNull, "delete")
          .when(col("c_hash") =!= col("p_hash"), "update")
          .otherwise("unchanged"))
      .filter(col(ChangeCol) =!= "unchanged")
      .select(
        keyCols.map(k => coalesce(col(s"c_$k"), col(s"p_$k")).as(k)) ++
          payload.map(cn => col(s"c_$cn").as(cn)) :+ col(ChangeCol): _*)
  }

  /** B23: audience MEMBERSHIP delta — the incremental form of custom-
    * audience sync (the reference's connectors send full add/remove user
    * lists; at 100 M members you send the DELTA): given the previous and
    * current membership key sets, emit (key, op) with op ∈ add|remove.
    * Members present in both snapshots produce nothing — steady-state
    * audiences cost O(churn), not O(size).
    *
    * Scale: one full-outer join on the key; both sides are key-only
    * projections (payload joins back AFTER the delta, against the churn
    * set only — see q89). Bucketed snapshots make it zero-shuffle. */
  def membershipDiff(curr: DataFrame, prev: DataFrame, keyCol: String): DataFrame =
    curr.select(col(keyCol)).distinct().withColumn("__c", lit(1))
      .join(prev.select(col(keyCol)).distinct().withColumn("__p", lit(1)),
            Seq(keyCol), "full_outer")
      .filter(col("__c").isNull || col("__p").isNull)
      .select(col(keyCol),
        when(col("__p").isNull, "add").otherwise("remove").as("op"))

  /** B32: THREE-WAY snapshot merge — bidirectional sync's conflict step:
    * given the last-synced BASE snapshot and the two sides' current
    * snapshots (warehouse "ours", destination "theirs"), classify every
    * key and produce the merged row plus its provenance:
    *  - changed on one side only → that side wins (classic fast-forward)
    *  - changed identically on both → clean convergence
    *  - changed differently on both → CONFLICT, resolved ours-wins (the
    *    warehouse is the source of truth in reverse-ETL; the flag lets a
    *    caller route conflicts elsewhere instead)
    *  - deleted on one side, unchanged on the other → delete propagates;
    *    deleted on one side but EDITED on the other → edit wins (the
    *    delete was against a stale row), flagged as a conflict
    * Null-safe per-column compares throughout — engine-portable, no
    * hashes, so the oracle replays the classification exactly.
    *
    * Scale: two co-keyed full-outer joins (base⋈ours⋈theirs); all three
    * snapshots bucket by key at 100 TB → zero-exchange SMJ, the q22
    * story. Output: one row per key that needs ANY action or exists
    * anywhere, with `merged_*` payload, `action` ∈
    * keep|update|delete, and `resolution` ∈ ours|theirs|both|none. */
  def threeWayMerge(base: DataFrame, ours: DataFrame, theirs: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty,
      "snapshot needs at least one non-key column (key-only rows have nothing to merge)")
    require(ours.columns.sameElements(base.columns) &&
            theirs.columns.sameElements(base.columns),
      "base/ours/theirs must share one schema")

    def pref(df: DataFrame, p: String): DataFrame =
      df.select((keyCols ++ payload).map(c => col(c).as(s"$p$c")) :+ lit(1).as(s"__$p"): _*)

    val j = pref(base, "b_")
      .join(pref(ours, "o_"), keyCols.map(k => col(s"b_$k") === col(s"o_$k")).reduce(_ && _), "full_outer")
      .join(pref(theirs, "t_"),
        keyCols.map(k => coalesce(col(s"b_$k"), col(s"o_$k")) === col(s"t_$k")).reduce(_ && _),
        "full_outer")

    def changed(p: String, q: String): Column =
      payload.map(c => !(col(s"$p$c") <=> col(s"$q$c"))).reduce(_ || _)
    val inB = col("__b_").isNotNull; val inO = col("__o_").isNotNull; val inT = col("__t_").isNotNull
    val oursChanged = (inB && inO && changed("b_", "o_")) || (inB && !inO) || (!inB && inO)
    val theirsChanged = (inB && inT && changed("b_", "t_")) || (inB && !inT) || (!inB && inT)
    val sameChange = inO === inT &&
      (!inO || payload.map(c => col(s"o_$c") <=> col(s"t_$c")).reduce(_ && _))

    // who supplies the merged payload
    val winner =
      when(oursChanged && theirsChanged && sameChange, "both")
        .when(oursChanged && theirsChanged && !inO && inT, "theirs") // our delete vs their edit: the edit wins
        .when(oursChanged && theirsChanged && inO && !inT, "ours")   // their delete vs our edit
        .when(oursChanged && theirsChanged, "ours")      // edit-edit conflict: warehouse wins
        .when(oursChanged, "ours")
        .when(theirsChanged, "theirs")
        .otherwise("none")                               // unchanged everywhere
    val conflict = oursChanged && theirsChanged && !sameChange
    // the winning side may have DELETED the row
    val winnerPresent =
      when(col("__w") === "ours", inO)
        .when(col("__w") === "theirs", inT)
        .when(col("__w") === "both", inO)
        .otherwise(inB)

    j.withColumn("__w", winner)
      .withColumn("__conflict", conflict)
      .withColumn("__present", winnerPresent)
      .select(
        keyCols.map(k => coalesce(col(s"b_$k"), col(s"o_$k"), col(s"t_$k")).as(k)) ++
          payload.map(c =>
            when(col("__w").isin("ours", "both"), col(s"o_$c"))
              .when(col("__w") === "theirs", col(s"t_$c"))
              .otherwise(col(s"b_$c")).as(s"merged_$c")) ++
          Seq(
            when(!col("__present"), "delete")
              .when(col("__w") === "none", "keep")
              .otherwise("update").as("action"),
            col("__w").as("resolution"),
            col("__conflict").as("conflict")): _*)
  }

  /** Order-insensitive-across-runs, null-discriminating content hash:
    * every column is paired with a null marker so (null, "x") ≠ ("x", null)
    * and xxhash64 sees a stable arity. */
  /** B39: INCREMENTAL JOIN MAINTENANCE — delta-join view maintenance for
    * the enrichment views every sync materializes (fact ⋈ broadcast dim):
    * instead of re-joining 100 TB of fact history against the dimension
    * every run, the maintained view updates from three bounded inputs —
    * the fact DELTA (upserts), deleted fact keys, and the dimension's own
    * changed-key set (exactly what [[snapshotDiff]] on the dim emits, so
    * B3 feeds B39):
    *
    *   V' = (V ∖ touched-or-deleted facts, dim-stale rows re-enriched)
    *        ∪ (Δfact ⋈ dim)
    *
    * Equals the one-shot recompute bit-for-bit (spec-pinned) while
    * reading only |V| + |Δ| rows: the historical FACT table never
    * appears in the plan. Caller contract: `oldView`'s columns are the
    * fact columns ++ `dim`'s non-key columns (the shape `enrich` syncs
    * materialize).
    *
    * Scale: one anti join on the view (the only view-wide work — and a
    * view scan is the floor for rewriting it), every other join side
    * (delta, deleted keys, changed dim keys, the dim itself) broadcasts
    * by contract. */
  def maintainJoin(oldView: DataFrame, factDelta: DataFrame,
                   deletedKeys: DataFrame, dim: DataFrame,
                   dimChangedKeys: DataFrame,
                   factKey: String, dimKey: String): DataFrame = {
    val gone = factDelta.select(col(factKey))
      .unionByName(deletedKeys.select(col(factKey))).distinct()
    val kept = oldView.join(broadcast(gone), Seq(factKey), "left_anti")
    val changed = dimChangedKeys.select(col(dimKey))
    val fresh = kept.join(broadcast(changed), Seq(dimKey), "left_anti")
    val dimCols = dim.columns.filterNot(_ == dimKey)
    val relinked = kept.join(broadcast(changed), Seq(dimKey), "left_semi")
      .drop(dimCols: _*)
      .join(broadcast(dim), Seq(dimKey), "left")
    val added = factDelta.join(broadcast(dim), Seq(dimKey), "left")
    fresh
      .unionByName(relinked.select(fresh.columns.map(col): _*))
      .unionByName(added.select(fresh.columns.map(col): _*))
  }

  private def contentHash(cols: Seq[Column]): Column =
    xxhash64(cols.flatMap(c => Seq(c.isNull.cast("int"), c)): _*)
}
