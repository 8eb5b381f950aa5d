package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C99: two-sample KOLMOGOROV–SMIRNOV drift audit per slice — the
 * distribution-shift gate of corpus maintenance: for every slice (a
 * source, a snapshot, a shard) measure the KS distance between the
 * slice's distribution of a metric and the REST of the corpus, so "which
 * domain's length/quality profile moved" answers deterministically
 * before a retrain. Complements the embedding-space drift pair (C81
 * prototype cosine, D23 score-bucket monitor) with the classic
 * nonparametric whole-distribution test on any numeric column.
 *
 * EXACT integer form, so the DuckDB oracle replays it bit-for-bit: with
 * per-slice counts cumulated over the ordered value domain into the
 * scaled ECDFs c_s(v) and n_s = |slice|, the KS numerator is
 * `D_num(s) = max_v |c_s(v)·n_rest − c_rest(v)·n_s|` and the reported
 * statistic is `ks_pm = 1000·D_num div (n_s·n_rest)` — the per-mille KS
 * distance, no doubles anywhere. The D_num cross products stay < 2⁶³
 * while the corpus row count is < ~3·10⁹ (N² bound); the final
 * `·1000 div (n_s·n_rest)` step is taken in DECIMAL(38,0) (oracle:
 * HUGEINT) so it adds NO tighter bound. Beyond ~3·10⁹ rows,
 * pre-bucketize values (the usual practice for unbounded domains
 * anyway) and/or widen the cumulations to DECIMAL on both engines.
 *
 * Scale shape: ONE corpus scan reduces to the (slice × value) count
 * frame; everything after rides the dense slice×value grid — sized by
 * the VALUE DOMAIN times the slice count, independent of corpus rows
 * (bucketize the metric first when its domain is unbounded). The grid
 * is built with broadcast slice/total frames (a 1-row and a
 * slices-sized broadcast — no shuffle-side cartesian), and the ECDF
 * windows partition by slice with value-domain-bounded frames.
 */
object Drift {

  /** Per-slice two-sample KS vs the rest of the corpus.
    *
    * Degenerate corpora are handled in-plan (no eager driver counts):
    * a single-slice corpus has n_rest = 0 and KS-vs-nothing is
    * undefined, so `ks_pm` comes back NULL rather than an ANSI
    * division error. `maxDistinctValues` bounds the slice×value grid —
    * an unbounded continuous metric would silently build a
    * corpus-sized grid; past the bound the query fails LOUDLY
    * (raise_error names the fix: bucketize the metric first). The
    * default leaves the plan byte-identical to the unguarded form.
    *
    * @return (slice, n_slice, n_rest, ks_pm, ks_at_value) — the
    *         per-mille KS distance and the smallest metric value
    *         attaining it (largest distance wins; value breaks ties). */
  def ksDrift(df: DataFrame, sliceCol: Column, valueCol: Column,
              maxDistinctValues: Long = Long.MaxValue): DataFrame = {
    val counts = df.select(sliceCol.as("slice"), valueCol.as("v"))
      .groupBy("slice", "v").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("slice").agg(sum(col("c")).as("n_s"))
    val guarded = maxDistinctValues != Long.MaxValue
    val grandTotal =
      if (guarded)
        counts.agg(sum(col("c")).as("n_all"),
          countDistinct(col("v")).as("n_v"))
      else counts.agg(sum(col("c")).as("n_all"))
    // dense slice×value grid: every slice sees every observed value, so
    // the cumulated ECDFs align at the same steps
    val grid0 = counts.select("v").distinct()
      .crossJoin(broadcast(totals.crossJoin(broadcast(grandTotal))))
      .join(counts, Seq("slice", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    // the loud-fail rides the count column itself, so column pruning can
    // never optimize the check away — it fires iff any grid row is built
    val grid = if (guarded)
      grid0.withColumn("c",
        when(col("n_v") <= lit(maxDistinctValues), col("c"))
          .otherwise(raise_error(format_string(
            "ksDrift: %d distinct metric values exceed maxDistinctValues=%d — bucketize the metric first",
            col("n_v"), lit(maxDistinctValues))).cast("long")))
    else grid0
    // the global cumulated count at each value — from the per-value
    // totals, cumulated over the tiny distinct-value frame
    val globalCum = counts.groupBy("v").agg(sum(col("c")).as("cv"))
      .withColumn("call", sum(col("cv")).over(
        Window.partitionBy(lit(1)).orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "call")
    val wCum = Window.partitionBy("slice").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diffs = grid
      .withColumn("cs", sum(col("c")).over(wCum))
      .join(globalCum, "v")
      .withColumn("n_rest", col("n_all") - col("n_s"))
      .withColumn("crest", col("call") - col("cs"))
      .withColumn("dnum", abs(col("cs") * col("n_rest") - col("crest") * col("n_s")))
    val wPick = Window.partitionBy("slice").orderBy(col("dnum").desc, col("v").asc)
    diffs.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("slice"), col("n_s").as("n_slice"), col("n_rest"),
        // n_rest = 0 (single-slice corpus): KS vs nothing is undefined —
        // NULL, not an ANSI division error (CaseWhen branches evaluate
        // conditionally, so the div never runs)
        when(col("n_rest") > 0,
          expr("cast(cast(dnum as decimal(38,0)) * 1000 div (cast(n_s as decimal(38,0)) * n_rest) as long)"))
          .as("ks_pm"),
        col("v").as("ks_at_value"))
  }

  /** Per-slice two-sample KS against a FIXED reference distribution —
    * the monitoring form: the reference is the calibration corpus's
    * (value, count) frame, incoming data drifts against it. The ECDFs
    * step at the UNION of both value sets (a reference-only step can be
    * where the gap peaks), cumulated with the same integer arithmetic as
    * [[ksDrift]].
    * @param reference (v, c) rows — the reference value counts.
    * @return (slice, n_slice, n_ref, ks_pm, ks_at_value). */
  def ksVsReference(df: DataFrame, reference: DataFrame,
                    sliceCol: Column, valueCol: Column): DataFrame = {
    val counts = df.select(sliceCol.as("slice"), valueCol.as("v"))
      .groupBy("slice", "v").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("slice").agg(sum(col("c")).as("n_s"))
    val ref = reference.select(col("v").cast("long").as("v"), col("c").cast("long").as("rc"))
    val refTotal = ref.agg(sum(col("rc")).as("n_ref"))
    // the ECDF step grid: union of batch and reference values
    val values = counts.select("v").union(ref.select("v")).distinct()
    val refCum = values.join(ref, Seq("v"), "left")
      .withColumn("rc", coalesce(col("rc"), lit(0L)))
      .withColumn("cref", sum(col("rc")).over(
        Window.partitionBy(lit(1)).orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("v", "cref")
    val wCum = Window.partitionBy("slice").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diffs = values
      .crossJoin(broadcast(totals.crossJoin(broadcast(refTotal))))
      .join(counts, Seq("slice", "v"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cs", sum(col("c")).over(wCum))
      .join(refCum, "v")
      .withColumn("dnum", abs(col("cs") * col("n_ref") - col("cref") * col("n_s")))
    val wPick = Window.partitionBy("slice").orderBy(col("dnum").desc, col("v").asc)
    diffs.withColumn("rn", row_number().over(wPick))
      .filter(col("rn") === 1)
      .select(col("slice"), col("n_s").as("n_slice"), col("n_ref"),
        // an empty reference has n_ref = 0: NULL, not a division error
        when(col("n_ref") > 0,
          expr("cast(cast(dnum as decimal(38,0)) * 1000 div (cast(n_s as decimal(38,0)) * n_ref) as long)"))
          .as("ks_pm"),
        col("v").as("ks_at_value"))
  }

  /** C151: POPULATION STABILITY INDEX — the industry-standard binned
    * drift scalar (credit-risk monitoring's PSI, the number every model
    * governance sheet reports next to KS): with the metric cut into B
    * equi-width bins over the corpus [min, max],
    *
    *   PSI = Σ_bins (p_i − q_i) · log(p_i / q_i)
    *
    * (p = reference bin shares, q = current). EXACT integer form via
    * the q10 fixed-point binary log ([[Search.log2q10Sql]], the C126 /
    * C131 kernel), so the DuckDB oracle replays it bit-for-bit — the
    * statistic is therefore in BITS (log₂), units q10·ppm; multiply by
    * ln 2 off-engine for nats. Per-bin counts take LAPLACE +1 smoothing
    * first (a' = a+1, A' = A+B) — empty bins are the NORM under real
    * drift and the smoothed form is the one practitioners compute —
    * then, with shares in exact ppm,
    *
    *   term_q10ppm = (ref_ppm − cur_ppm) · (l2(a'·C') − l2(c'·A'))
    *
    * where a'/A' are smoothed reference counts/total and c'/C' current.
    * The cross products a'·C' stay < 2⁶³ while each side is < ~3·10⁹
    * rows — the C99 KS bound; pre-aggregate or subsample past it.
    * Every bin term and the total are integers end-to-end.
    *
    * Scale shape: ONE pass for the corpus extrema (1-row broadcast),
    * ONE scan collapsing the corpus to the 2·B-row (bin × side) count
    * frame via map-side partial agg, then everything rides the B-row
    * spine (built by a bounded explode, so empty bins exist for the
    * smoothing). No window anywhere; the total broadcasts back onto
    * the per-bin rows.
    *
    * @param isRefCol boolean — true rows form the REFERENCE population.
    * @param valueCol integer-valued metric (cast to long).
    * @return B rows: (bin, lo, hi, n_ref, n_cur, ref_ppm, cur_ppm,
    *         term_q10ppm, psi_q10ppm) — lo/hi the bin's value bounds,
    *         psi_q10ppm the total repeated on every row. */
  def psi(df: DataFrame, isRefCol: Column, valueCol: Column,
          bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins must be 2..10000 (got $bins)")
    val base = df.select(isRefCol.as("is_ref"), valueCol.cast("long").as("v"))
    val ext = base.agg(min("v").as("mn"), max("v").as("mx"))
    val binned = base.crossJoin(broadcast(ext))
      .withColumn("bin", expr(
        s"cast(cast(v - mn as decimal(38,0)) * $bins div (cast(mx as decimal(38,0)) - mn + 1) as long)"))
      .groupBy("bin").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("a"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("c"))
    // the full bin spine: empty bins must exist for the smoothing
    val spine = ext.select(explode(expr(s"sequence(0L, ${bins - 1}L)")).as("bin"),
      col("mn"), col("mx"))
    val filled = spine.join(binned, Seq("bin"), "left")
      .select(col("bin"), col("mn"), col("mx"),
        coalesce(col("a"), lit(0L)).as("a"), coalesce(col("c"), lit(0L)).as("c"))
    psiTerms(filled, bins)
  }

  /** PSI of `df`'s metric distribution against a FIXED calibration
    * reference — the monitor form of [[psi]] (D38): bin edges come from
    * the CALIBRATION extrema `(mn, mx)` (fixed at calibration time, the
    * standard practice — a monitor whose bins move with each batch
    * can't be compared across batches), batch values OUTSIDE the
    * calibration range clamp into the edge bins (out-of-range mass is
    * drift signal, not an error), and the reference arrives as its
    * per-bin counts (a B-row literal — KBs). Same smoothing, same q10
    * log, same output columns as [[psi]]. */
  def psiVsReference(df: DataFrame, valueCol: Column,
                     refCounts: Seq[(Long, Long)], mn: Long, mx: Long,
                     bins: Int = 10): DataFrame = {
    require(bins >= 2 && bins <= 10000 && mx >= mn)
    require(refCounts.forall(b => b._1 >= 0 && b._1 < bins && b._2 >= 0),
      "refCounts must be (bin in [0, bins), count >= 0) pairs")
    require(refCounts.map(_._1).distinct.size == refCounts.size,
      "duplicate reference bins would silently collapse — merge them first")
    val spark = df.sparkSession
    import spark.implicits._
    val cur = df.select(valueCol.cast("long").as("v"))
      .withColumn("bin", expr(
        s"greatest(0L, least(${bins - 1}L, " +
          s"cast(cast(v - ${mn}L as decimal(38,0)) * $bins div (cast(${mx}L as decimal(38,0)) - ${mn}L + 1) as long)))"))
      .groupBy("bin").agg(count(lit(1)).as("c"))
    val refFull = (0L until bins.toLong)
      .map(b => (b, refCounts.toMap.getOrElse(b, 0L)))
    val spine = refFull.toDF("bin", "a")
      .withColumn("mn", lit(mn)).withColumn("mx", lit(mx))
    val filled = spine.join(cur, Seq("bin"), "left")
      .select(col("bin"), col("mn"), col("mx"), col("a"),
        coalesce(col("c"), lit(0L)).as("c"))
    psiTerms(filled, bins)
  }

  /** The shared PSI arithmetic from the filled (bin, mn, mx, a, c)
    * frame: Laplace +1, exact ppm shares, q10-log per-bin terms, the
    * broadcast total. */
  private def psiTerms(filled: DataFrame, bins: Int): DataFrame = {
    val tot = filled.agg(sum("a").as("ta"), sum("c").as("tc"))
    val l2 = Search.log2q10Sql _
    val terms = filled.crossJoin(broadcast(tot))
      // Laplace +1 per bin: a' = a+1, A' = ta+bins (same for current)
      .withColumn("ap", col("a") + 1L).withColumn("cp", col("c") + 1L)
      .withColumn("tap", col("ta") + lit(bins.toLong))
      .withColumn("tcp", col("tc") + lit(bins.toLong))
      .withColumn("ref_ppm", expr("1000000 * ap div tap"))
      .withColumn("cur_ppm", expr("1000000 * cp div tcp"))
      .withColumn("term_q10ppm", expr(
        s"(ref_ppm - cur_ppm) * (${l2("ap * tcp")} - ${l2("cp * tap")})"))
    val total = terms.agg(sum("term_q10ppm").as("psi_q10ppm"))
    terms.crossJoin(broadcast(total))
      .select(col("bin"),
        // equi-width bin bounds: bin i covers [mn + ceil(i·W/B), …)
        (col("mn") + expr(s"cast((bin * (cast(mx as decimal(38,0)) - mn + 1) + $bins - 1) div $bins as long)")).as("lo"),
        (col("mn") + expr(s"cast(((bin + 1) * (cast(mx as decimal(38,0)) - mn + 1) + $bins - 1) div $bins as long)") - 1L).as("hi"),
        col("a").as("n_ref"), col("c").as("n_cur"),
        col("ref_ppm"), col("cur_ppm"), col("term_q10ppm"), col("psi_q10ppm"))
  }
}
