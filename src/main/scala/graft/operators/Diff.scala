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

  /** Order-insensitive-across-runs, null-discriminating content hash:
    * every column is paired with a null marker so (null, "x") ≠ ("x", null)
    * and xxhash64 sees a stable arity. */
  private def contentHash(cols: Seq[Column]): Column =
    xxhash64(cols.flatMap(c => Seq(c.isNull.cast("int"), c)): _*)
}
