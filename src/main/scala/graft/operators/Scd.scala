package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * SCD Type-2 history maintenance — the warehouse-side twin of the
 * reference's snapshot diff (see [[Diff]]): instead of EMITTING
 * insert/update/delete operations for a destination, fold a new source
 * snapshot into a versioned dimension history (valid_from / valid_to /
 * is_current), the standard shape for "what did this row look like when
 * the sync ran" questions the reference's sync bookkeeping answers
 * row-at-a-time (packages/core/src/commands/sync.ts keeps last-synced
 * rows in its KV store; studied, not ported).
 *
 * Scale design (100 TB dimension): already-closed versions never join —
 * they are filtered out BEFORE the shuffle and unioned back verbatim, so
 * each apply shuffles only the OPEN generation + the incoming snapshot
 * (both bucketable by key → zero-exchange sort-merge, the q22/BucketedDiff
 * pattern). Each joined row expands to its 1–2 output versions through a
 * single generator (explode of a 2-slot array) — one pass, no
 * self-union re-scanning the join.
 */
object Scd {

  val MetaCols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** Fold `current` (key + payload snapshot) into `history`
    * (key + payload + valid_from/valid_to/is_current) as of `effective`:
    *  - new key            → open version (valid_from = effective)
    *  - changed payload    → old version closed at effective + new open version
    *  - vanished key       → old version closed at effective (soft delete);
    *                         with `closeMissing = false` (upsert-slice /
    *                         CDC-stream mode, where the input is NOT a full
    *                         snapshot) the open version stays open instead
    *  - unchanged          → open version passes through untouched
    * Payload comparison is null-safe per column (engine-portable — no
    * hash), so a DuckDB oracle can replay the classification exactly. */
  def applyScd2(history: DataFrame, current: DataFrame, keyCols: Seq[String],
                effective: Column, closeMissing: Boolean = true): DataFrame = {
    val payload = current.columns.filterNot(keyCols.contains).toSeq
    require(payload.nonEmpty,
      "snapshot needs at least one non-key column (a key-only snapshot has no payload to version)")
    val outCols = keyCols ++ payload ++ MetaCols
    require(history.columns.toSeq == outCols,
      s"history schema must be keys ++ payload ++ $MetaCols; " +
        s"got ${history.columns.mkString(",")}")

    val closed = history.filter(!col("is_current"))
    val open = history.filter(col("is_current"))

    val h = open.select(
      (keyCols ++ payload).map(c => col(c).as(s"h_$c")) :+
        col("valid_from").as("h_valid_from") :+ lit(1).as("__h"): _*)
    val c = current.select(
      (keyCols ++ payload).map(cn => col(cn).as(s"c_$cn")) :+ lit(1).as("__c"): _*)

    val joined = h.join(c, keyCols.map(k => col(s"h_$k") === col(s"c_$k")).reduce(_ && _),
      "full_outer")
    val changed = payload.map(p => !(col(s"h_$p") <=> col(s"c_$p"))).reduce(_ || _)

    def version(prefix: String, from: Column, to: Column, cur: Column): Column =
      struct(
        keyCols.map(k => coalesce(col(s"h_$k"), col(s"c_$k")).as(k)) ++
          payload.map(p => col(s"$prefix$p").as(p)) ++
          Seq(from.as("valid_from"), to.cast("timestamp").as("valid_to"),
              cur.as("is_current")): _*)

    val nullTs = lit(null).cast("timestamp")
    // Slot 1: the surviving/closed form of the historical version, or (for
    // brand-new keys) the freshly opened one. Slot 2: the new open version
    // when an update closed slot 1 — null (skipped) otherwise.
    val openUntouched = version("h_", col("h_valid_from"), nullTs, lit(true))
    val closedAtEff = version("h_", col("h_valid_from"), effective, lit(false))
    val slot1 =
      when(col("__h").isNull, version("c_", effective, nullTs, lit(true)))
        .when(col("__c").isNull, if (closeMissing) closedAtEff else openUntouched)
        .when(changed, closedAtEff)
        .otherwise(openUntouched)
    val slot2 =
      when(col("__h").isNotNull && col("__c").isNotNull && changed,
        version("c_", effective, nullTs, lit(true)))

    val applied = joined
      .select(explode(array(slot1, slot2)).as("v"))
      .filter(col("v").isNotNull)
      .select(outCols.map(cn => col(s"v.$cn")): _*)

    closed.unionByName(applied)
  }

  /** B44: POINT-IN-TIME read of an SCD2 history — the time-travel query
    * the versioned dimension exists for: the rows valid AT `at` under the
    * half-open [valid_from, valid_to) membership rule (an open generation
    * has NULL valid_to). A pure filter — it pushes into the history scan,
    * so a parquet-backed dimension reads only the generations whose
    * valid_from stripe survives the predicate. */
  def asOf(history: DataFrame, at: Column,
           validFrom: String = "valid_from", validTo: String = "valid_to"): DataFrame =
    history.filter(col(validFrom) <= at &&
      (col(validTo).isNull || col(validTo) > at))
}
