package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C98: Z-ORDER storage layout + scan-pruning audit — the multi-column
 * data-clustering technique lakehouse table formats use so min/max file
 * statistics can skip files for MULTI-dimensional predicates (a single
 * sort key prunes one dimension perfectly and every other dimension not
 * at all; bit-interleaving gives every participating dimension locality).
 * At 100 TB the scan you AVOID is the cheapest scan: layout quality is a
 * first-class performance lever, so graft treats it as an auditable
 * operator, not a storage-engine side effect.
 *
 * Everything is exact integer arithmetic — bit interleave, equal-width
 * file assignment over the observed key domain, per-file min/max, box
 * overlap — so the DuckDB oracle replays the whole audit bit-for-bit.
 *
 * Scale shape: the Z-key is a codegen'd per-row expression (no shuffle);
 * file assignment needs ONE broadcast max; the stats frame is
 * files-sized (KBs at any corpus size); probes evaluate against the
 * stats frame only. The corpus is scanned once for stats and once per
 * probe-row count — never sorted (equal-width ranges make file ids a
 * pure function of the key, the write path is a hash-free
 * `repartitionByRange`-shaped assignment both engines can replay).
 */
object Layout {

  /** The Z-address (Morton code) of `dims` pre-bucketized non-negative
    * values, `bits` bits each: bit b of dim i lands at position
    * b·k + i. Pure codegen'd bit arithmetic — 2·bits·k shifts, no UDF.
    * Callers bucketize each dimension into [0, 2^bits) first (modulo or
    * min-shift); locality of the bucketized value is what file skipping
    * uses. */
  def zOrderKey(dims: Seq[Column], bits: Int = 16): Column = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.length <= 63,
      s"z-key needs 1..63 total bits, got ${dims.length} dims x $bits")
    val k = dims.length
    val terms = for {
      (d, i) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(d, b).bitwiseAND(lit(1L)), b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Equal-width file assignment over the observed key domain:
    * `file = key · files div (max+1)` with the 1-row broadcast max —
    * deterministic, sort-free, and exactly replayable (unlike a
    * rank-based equal-count split, which needs a global sort). Appends
    * `__file`. */
  def assignFiles(df: DataFrame, key: Column, files: Int): DataFrame = {
    require(files >= 1)
    val mx = df.agg(max(key).cast("long").as("__mx"))
    df.withColumn("__k", key.cast("long"))
      .crossJoin(broadcast(mx))
      .withColumn("__file", expr(s"__k * $files div (__mx + 1)"))
      .drop("__k", "__mx")
  }

  /** Per-file min/max statistics for `dims` plus the row count — the
    * footer-stats frame a format like Parquet keeps; files-sized. */
  def fileStats(df: DataFrame, dims: Seq[String]): DataFrame =
    df.groupBy("__file").agg(
      count(lit(1)).as("n_rows"),
      dims.flatMap(d => Seq(min(col(d)).as(s"min_$d"), max(col(d)).as(s"max_$d"))): _*)

  /** How many files a conjunctive box probe must touch: a file survives
    * pruning iff EVERY probed dimension's [min,max] overlaps the probe
    * interval. Returns the 1-row (files_touched, files_total) frame. */
  def filesTouched(stats: DataFrame, probe: Seq[(String, Long, Long)]): DataFrame = {
    val overlap = probe.map { case (d, lo, hi) =>
      col(s"min_$d") <= lit(hi) && col(s"max_$d") >= lit(lo)
    }.reduce(_ && _)
    stats.agg(
      sum(when(overlap, 1L).otherwise(0L)).as("files_touched"),
      count(lit(1)).as("files_total"))
  }
}
