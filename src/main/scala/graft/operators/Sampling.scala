package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling / dataset-split operators for training-data
 * pipelines.
 *
 * Scale design (100 TB): splits are pure per-row hash arithmetic — no
 * shuffle, no sort, no RNG state — so they run at scan speed, give every
 * row a stable assignment under reruns, repartitioning, and incremental
 * appends (the property `df.randomSplit` does NOT have), and any engine
 * can reproduce the assignment for audit (md5 is universal; xxhash64
 * isn't).
 */
object Sampling {

  /** Stable per-key bucket in [0, 100): top 60 bits of md5(key) mod 100. */
  def pctBucket(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"), lit(100L))

  /** Split label as a single column expression (for single-pass plans). */
  def splitCol(bucket: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    require(trainPct + valPct <= 100, "train+val must leave room for test")
    when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic train/val/test assignment by key hash. */
  def hashSplit(df: DataFrame, idCol: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame =
    df.withColumn("bucket", pctBucket(col(idCol)))
      .withColumn("split", splitCol(col("bucket"), trainPct, valPct))
}
