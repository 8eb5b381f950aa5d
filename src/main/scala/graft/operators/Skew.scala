package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Salted join for pathological key skew.
 *
 * AQE's skew-join handling splits oversized partitions at runtime and
 * covers moderate skew for free (enabled in GraftSession). Salting is the
 * remedy one tier further out: a SINGLE key so hot that every row of it
 * must not land on one task. The skewed side gets a deterministic salt in
 * [0, salts) hashed from its full row content; the other side is exploded
 * ×salts so every (key, salt) bucket still finds its match. Join
 * cardinality and results are identical to the plain join; the cost is
 * |other| × salts replication — so salt the SMALLER side's counterpart
 * and keep `salts` at the executor-count scale, not thousands.
 */
object Skew {

  /** `skewed ⋈ other` on `keys`, with the skewed side spread over `salts`
    * sub-buckets. Inner and left-outer (skewed side preserved) supported. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val salted = skewed.withColumn("__salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts.toLong)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** B28: join-key SKEW profile — the audit you run BEFORE deciding
    * between a plain shuffle join, AQE skew splitting, and
    * [[saltedJoin]]: the top-k hottest keys with their share of all
    * rows, next to the key-space totals. A key whose share approaches
    * 1/executors is the salting signal.
    *
    * Scale: one map-side-partial count per key + a TakeOrderedAndProject
    * top-k (never a full sort); totals ride a 1-row broadcast. Share is
    * exact long/long division. */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1)
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("total_rows"),
      count(lit(1)).as("n_keys"), max(col("n")).as("max_n"))
    counts.orderBy(col("n").desc, col("key").asc).limit(topK)
      .crossJoin(broadcast(totals))
      .select(col("key"), col("n"), col("total_rows"), col("n_keys"),
        (col("n").cast("double") / col("total_rows")).as("share"),
        (col("max_n").cast("double") * col("n_keys") / col("total_rows")).as("skew_factor"))
      .orderBy(col("n").desc, col("key").asc)
  }
}
