package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C150: hash-determinized POISSON BOOTSTRAP — uncertainty
 * quantification without an RNG (the family every dataset-card number
 * in this catalog lacked: q110 reports means, nothing reports their
 * STANDARD ERROR): the classic Poisson(1) bootstrap (each row enters
 * replicate r with multiplicity W ~ Poisson(1) — the streaming-safe
 * approximation of multinomial resampling, Chamandy et al. 2012 /
 * Kleiner et al.'s workhorse), made engine-replayable by drawing W
 * from the FIXED quantized Poisson CDF: W_ir = #{k : T_k ≤ hu_ir}
 * where hu = unsigned xxhash64(id‖':'‖r) and T_k = ⌊CDF_k·2⁶⁴⌋ are
 * shared integer literals — both engines land on identical weights,
 * so every replicate mean replays bit-for-bit.
 *
 * Per replicate: exact integer weighted sums (Σw, Σw·x in
 * DECIMAL(38,0)); the replicate mean and the SE across replicates are
 * the single mirrored double read-outs (the A33/q112 discipline).
 *
 * Scale shape: ONE scan fans out ×R (explode of the replicate-id
 * sequence — map-side partial aggregation collapses it before any
 * shuffle), then everything lives on the R-row replicate frame. R is
 * a constant (32–200); corpus size only enters the scan.
 */
object Bootstrap {

  /** ⌊CDF_{Poisson(1)}(k)·2⁶⁴⌋ for k = 0..8 (weights capped at 9 —
    * P(W>9|n≥1 draw) < 10⁻⁷; the cap is shared with the oracle so it
    * is a contract, not an approximation error). */
  val poissonT: Seq[BigInt] = Seq(
    BigInt("6786177901268885274"), BigInt("13572355802537770549"),
    BigInt("16965444753172213186"), BigInt("18096474403383694065"),
    BigInt("18379231815936564285"), BigInt("18435783298447138329"),
    BigInt("18445208545532234003"), BigInt("18446555009401533385"),
    BigInt("18446723317385195808"))

  private val U64 = "18446744073709551616"

  /** Per-replicate weighted sums and means — one row per replicate:
    * (r, n_eff, wsum, wxsum, mean_ppm, mean) — mean_ppm is the EXACT
    * integer 10⁶·Σwx div Σw (what the CI aggregates: a float sum of
    * replicate means would be partition-order dependent); `mean` is
    * the per-row double read-out for humans.
    *
    * CONTRACT: `idCol` must be UNIQUE per row — the weights are a pure
    * hash of (id, replicate), so duplicate ids draw IDENTICAL weights
    * (perfectly correlated resampling) and the bootstrap variance is
    * silently understated. An all-zero replicate (every row draws
    * W = 0 — probability e^{-n}, so only tiny inputs) has no mean; it
    * is DROPPED here (`wsum > 0`) rather than emitted as a NULL row
    * that downstream sums would skip silently — `n_replicates` in
    * [[bootstrapCi]] then reports the replicates actually used. */
  def bootstrapReplicates(df: DataFrame, idCol: Column, valueCol: Column,
                          replicates: Int): DataFrame = {
    require(replicates >= 2)
    val hu =
      s"""(CAST(xxhash64(concat(__bs_k, ':', CAST(r AS STRING))) AS DECIMAL(38,0))
         | + CASE WHEN xxhash64(concat(__bs_k, ':', CAST(r AS STRING))) < 0
         |        THEN CAST('$U64' AS DECIMAL(38,0)) ELSE 0 END)""".stripMargin
    val wExpr = poissonT.map(t => s"(CASE WHEN __hu >= CAST('$t' AS DECIMAL(38,0)) THEN 1 ELSE 0 END)")
      .mkString("(", " + ", ")")
    df.select(idCol.cast("string").as("__bs_k"), valueCol.cast("long").as("x"))
      .withColumn("r", explode(expr(s"sequence(1, $replicates)")))
      .withColumn("__hu", expr(hu))
      .withColumn("w", expr(s"CAST($wExpr AS BIGINT)"))
      .groupBy("r")
      .agg(sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_eff"),
        sum(col("w")).as("wsum"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * x")).as("wxsum"))
      .filter(col("wsum") > 0L)
      .withColumn("mean_ppm", expr("CAST(1000000 * wxsum div wsum AS BIGINT)"))
      .withColumn("mean", col("wxsum").cast("double") / col("wsum").cast("double"))
  }

  /** Bootstrap standard error + normal-approximation CI of the mean of
    * `valueCol` — ONE summary row: (n_rows, mean_full, n_replicates,
    * se_boot, ci_lo, ci_hi). Determinism discipline: each replicate
    * mean is quantized to EXACT integer ppm first (a float sum of
    * replicate means would be partition-order dependent — the q112
    * rule), the across-replicate power sums are exact
    * longs/DECIMAL(38,0), and se/ci are the single mirrored double
    * read-outs at the end. The double variance sm2 − sm²/n is clamped
    * at zero before the sqrt: a (near-)constant value column makes all
    * replicate means equal, and rounding can land the difference an
    * ulp below zero — which would NaN the SE and both CI bounds. */
  def bootstrapCi(df: DataFrame, idCol: Column, valueCol: Column,
                  replicates: Int = 48): DataFrame = {
    val reps = bootstrapReplicates(df, idCol, valueCol, replicates)
    val full = df.select(valueCol.cast("long").as("x"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"))
    val d = (c: Column) => c.cast("double")
    reps
      .agg(count(lit(1)).as("n_replicates"),
        sum(col("mean_ppm")).as("sm"),
        sum(expr("CAST(mean_ppm AS DECIMAL(38,0)) * mean_ppm")).as("sm2"))
      .crossJoin(broadcast(full))
      .select(col("n_rows"),
        (d(col("sx")) / d(col("n_rows"))).as("mean_full"),
        col("n_replicates"),
        (sqrt(greatest(lit(0.0),
          d(col("sm2")) - d(col("sm")) * d(col("sm")) / d(col("n_replicates"))) /
          (d(col("n_replicates")) - 1.0)) / lit(1000000.0)).as("se_boot"))
      .withColumn("ci_lo", col("mean_full") - lit(2.0) * col("se_boot"))
      .withColumn("ci_hi", col("mean_full") + lit(2.0) * col("se_boot"))
  }
}
