package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The GROUP-CAP kernel shared by every within-group pair-expansion
 * operator (B54 item recs, C139 pair rules, C146 sequence rules, the
 * co-purchase edge builders): a group of s distinct members expands
 * into s·(s−1) directed (or s·(s−1)/2 unordered) pair rows in a
 * same-group self-join, so ONE oversized group — a bot session, a
 * shared account, a crawler's mega-order — is a quadratic blowup no
 * partitioning absorbs. The kernel REFUSES groups larger than the cap
 * (excluded whole, never partially counted — partial counting would
 * silently bias the statistics the pairs feed) and returns the exact
 * refusal ledger alongside, so the cap is loud and quantified, never a
 * silent truncation. The same contract as `Graph.butterflies`'
 * hub cap and `Dedup.winnowingPairs`' document-frequency cap —
 * `PairExpansionGateSpec` gates the class.
 */
object Pairs {

  /** Split a distinct (group, member) frame into the kept rows (groups
    * with ≤ `maxGroupSize` members) and the ONE-row exact refusal
    * ledger. The caller must have deduplicated `gm` — sizes are row
    * counts per group.
    *
    * Scale shape: one bounded size aggregation, one 1-row rollup, one
    * co-partitioned semi-join on the group key. The dropped-pair sum
    * rides DECIMAL(38,0) (a 10⁹-member group's s·(s−1) passes int64).
    *
    * @return (kept, ledger) — ledger columns `n_groups_capped` (LONG)
    *         and `pairs_dropped_dec` (DECIMAL(38,0), Σ s·(s−1) directed
    *         pairs over refused groups; halve for unordered joins). */
  def capGroups(gm: DataFrame, groupCol: String,
                maxGroupSize: Long): (DataFrame, DataFrame) = {
    require(maxGroupSize >= 2, s"maxGroupSize must allow a pair (got $maxGroupSize)")
    val sz = gm.groupBy(col(groupCol)).agg(count(lit(1)).as("__sz"))
    val ledger = sz.agg(
      coalesce(sum(when(col("__sz") > maxGroupSize, 1L).otherwise(0L)), lit(0L))
        .as("n_groups_capped"),
      coalesce(sum(when(col("__sz") > maxGroupSize,
          expr("cast(__sz as decimal(38,0)) * (__sz - 1)"))
        .otherwise(lit(0).cast("decimal(38,0)"))), lit(0).cast("decimal(38,0)"))
        .as("pairs_dropped_dec"))
    val kept = gm.join(sz.filter(col("__sz") <= maxGroupSize).select(groupCol),
      Seq(groupCol), "left_semi")
    (kept, ledger)
  }
}
