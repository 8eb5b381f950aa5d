package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C120/C121: DISTRIBUTION-SHAPE audits — two classic one-pass shape
 * statistics the quality/drift family (KS C99, TVD B43, CUSUM C115)
 * doesn't cover:
 *
 *  - BENFORD's-law audit (C120): naturally-grown magnitude data has
 *    first significant digits distributed log10(1+1/d) — fabricated,
 *    capped, or unit-mangled feeds don't. The classic
 *    fraud/data-quality screen on money columns. Per slice, the
 *    per-mille total-variation distance between the observed
 *    first-digit shares and the Benford expectation (both sides in
 *    integer per-mille — the expectation as the shared literal vector
 *    ⌊1000·log10(1+1/d)⌋, so both engines compare against identical
 *    constants and the statistic replays bit-for-bit).
 *
 *  - GINI concentration (C121): how concentrated a corpus's mass is
 *    across its units ("5% of domains hold 80% of tokens") — the
 *    dataset-card concentration scalar next to the Zipf profile (C85
 *    shows the SHAPE, Gini compresses it to one comparable number).
 *    Exact integer form of the sorted-rank formula
 *    G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over ascending-sorted xᵢ:
 *    per-mille with a single truncating division of cross-multiplied
 *    DECIMAL(38,0) terms — no doubles anywhere.
 *
 * Scale shape: each audit is ONE scan reduced to a bounded frame
 * (9 digits × slices; one row per unit), then window/aggregate work on
 * that frame. The Gini rank window partitions BY SLICE (units per
 * slice = domains/sources — bounded by design; this is a per-slice
 * card statistic, not a per-row one).
 */
object Audits {

  /** ⌊1000·log10(1+1/d)⌋ for d = 1..9 — the shared Benford per-mille
    * expectation (sums to 998; the TVD against it is still exact and
    * shared). */
  val benfordPm: Seq[Long] = Seq(301L, 176L, 124L, 96L, 79L, 66L, 57L, 51L, 45L)

  /** Per-slice Benford audit over a positive INTEGER column — scale
    * money to cents first (`cast(x as decimal(18,2)) * 100`): scaling
    * by a power of ten preserves the first significant digit, and the
    * digit of an integer is engine-exact (string head of the decimal
    * rendering — a float log10/pow route would hinge on cross-engine
    * ULP agreement).
    *
    * @param valueCol positive integer values (rows <= 0 are ignored —
    *                 no first significant digit).
    * @return one row per slice: (slice, n_rows, tvd_pm, worst_digit,
    *         worst_gap_pm) — TVD = Σ|obs−exp| div 2 in per-mille, the
    *         digit with the largest |gap|, and that gap (signed,
    *         observed − expected; smallest digit wins ties). */
  def benford(df: DataFrame, sliceCol: Column, valueCol: Column): DataFrame = {
    val digits = df.select(sliceCol.as("slice"), valueCol.cast("long").as("v"))
      .filter(col("v") > 0)
      .withColumn("d", substring(col("v").cast("string"), 1, 1).cast("long"))
      .filter(col("d").between(1, 9))
    val counts = digits.groupBy("slice", "d").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("slice").agg(sum(col("c")).as("n"))
    val expect = benfordPm.zipWithIndex
      .map { case (pm, i) => (i + 1L, pm) }
    val expectDf = digits.sparkSession.createDataFrame(expect).toDF("d", "exp_pm")
    // dense slice×digit grid: a missing digit is a 301-per-mille gap,
    // not a missing row
    val grid = expectDf.crossJoin(broadcast(totals))
      .join(counts, Seq("slice", "d"), "left")
      .withColumn("obs_pm", expr("coalesce(c, 0) * 1000 div n"))
      .withColumn("gap", col("obs_pm") - col("exp_pm"))
    val wPick = Window.partitionBy("slice").orderBy(abs(col("gap")).desc, col("d").asc)
    grid.withColumn("rk", row_number().over(wPick))
      .groupBy("slice")
      .agg(max(col("n")).as("n_rows"),
        expr("sum(abs(gap)) div 2").as("tvd_pm"),
        max(when(col("rk") === 1, col("d"))).as("worst_digit"),
        max(when(col("rk") === 1, col("gap"))).as("worst_gap_pm"))
  }

  /** Per-slice Gini concentration of a non-negative mass column over
    * units (one input row per unit, pre-aggregated by the caller).
    *
    * @return one row per slice: (slice, n_units, total, gini_pm) —
    *         1000·G truncating; single-unit or zero-mass slices are 0
    *         by definition. */
  def gini(units: DataFrame, sliceCol: Column, massCol: Column): DataFrame = {
    val base = units.select(sliceCol.as("slice"), massCol.as("x"))
    val w = Window.partitionBy("slice").orderBy(col("x").asc)
    base
      .withColumn("i", row_number().over(w))
      .withColumn("ix", col("i") * col("x"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_units"), sum(col("x")).as("total"),
        sum(col("ix").cast("decimal(38,0)")).as("six"))
      // G·1000 = (2000·Σi·x − 1000·(n+1)·Σx) div (n·Σx)
      .select(col("slice"), col("n_units"), col("total"),
        when(col("total") > 0 && col("n_units") > 1,
          expr("cast((2000 * six - cast(1000 as decimal(38,0)) * (n_units + 1) * total) div (cast(n_units as decimal(38,0)) * total) as long)"))
          .otherwise(lit(0L)).as("gini_pm"))
  }

  /** C131: per-slice unigram ENTROPY + KL-vs-corpus — the information-
    * theoretic completion of the shape family (Zipf C85 shows the rank
    * curve, Gini C121 the concentration, Benford C120 the digit law;
    * entropy compresses "how DIVERSE is this source's vocabulary use"
    * and KL "how far does it sit from the corpus mixture" — the
    * dataset-card numbers domain-mixture planning reads). EXACT
    * integers via the q10 fixed-point binary log
    * ([[Search.log2q10Sql]], the C126 kernel):
    *
    *   H_s  = Σ_t c·(l2(n_s) − l2(c)) div n_s          (q10 bits)
    *   KL_s = Σ_t c·((l2(c) − l2(n_s)) − (l2(g_t) − l2(M))) div n_s
    *   h_norm_pm = 1000·H_s div l2(V_s)                (NULL when V_s=1)
    *
    * where c = slice term count, n_s = slice total, g_t = corpus term
    * count, M = corpus total, V_s = slice distinct terms. The l2
    * quantization makes per-term KL contributions off by < 1/1024 bit
    * each — KL can read slightly negative near zero; that is the
    * documented contract, not an error. Sums ride DECIMAL(38,0).
    *
    * Scale shape: one (slice, term) count agg, one (term) corpus agg
    * joined co-partitioned on term, the 1-row corpus scalar broadcast,
    * one per-slice reduce. Never materializes anything wider than the
    * (slice × vocabulary) count frame.
    *
    * @param tokens one row per token OCCURRENCE: (slice, token).
    * @return (slice, n_tokens, n_distinct, h_q10, h_norm_pm, kl_q10). */
  /** C160: per-slice JENSEN–SHANNON divergence vs the rest of the
    * corpus — the SYMMETRIC, √-metrizable, [0,1]-bounded companion of
    * C131's KL (KL explodes on disjoint support and is asymmetric; JS
    * is what corpus-comparison dashboards actually plot):
    *
    *   JS(P‖Q) = ½·Σ p·log₂(2p/(p+q)) + ½·Σ q·log₂(2q/(p+q))
    *
    * with P the slice unigram and Q the rest-of-corpus unigram. EXACT
    * integer form via the q10 binary log: with c/d the slice/rest term
    * counts and N₁/N₂ their totals, 2p/(p+q) = 2cN₂/(cN₂+dN₁), so
    * per-term contributions are c·(l2(2cN₂) − l2(cN₂+dN₁)) — and the
    * DISJOINT-SUPPORT mass needs no per-term rows at all: a term
    * absent from the other side contributes exactly c·l2(2) = c·1024
    * (the fixed-point log is EXACTLY translation-by-1024 under
    * doubling), so both tails fold into closed-form aggregates of the
    * intersection frame. JS in q10 bits: 1024 = maximal divergence
    * (disjoint supports), 0 = identical distributions.
    *
    * Scale shape: ONE (slice, term) count pass; per-term logs only on
    * each slice's OWN vocabulary rows (never the dense slice×vocab
    * grid — the closed-form tails are what make that legal); bounded
    * per-slice reduce. The cross products cN₂ stay < 2⁶³ under the C99
    * ~3·10⁹-token bound; widen past it.
    *
    * @param tokens one row per token OCCURRENCE: (slice, token).
    * @return (slice, n_slice, n_rest, js_q10) — NULL js when the rest
    *         is empty (single-slice corpus). */
  def jsDivergence(tokens: DataFrame, sliceCol: Column, tokenCol: Column): DataFrame = {
    val base = tokens.select(sliceCol.as("slice"), tokenCol.as("tok"))
    val c = base.groupBy("slice", "tok").agg(count(lit(1)).as("c"))
    val g = c.groupBy("tok").agg(sum("c").cast("long").as("g"))
    val ns = c.groupBy("slice").agg(sum("c").cast("long").as("n1"))
    val m = g.agg(sum("g").cast("long").as("m_total"))
    val l2 = graft.operators.Search.log2q10Sql _
    // intersection-frame terms: d = rest count of a term the slice has
    val terms = c.join(g, "tok").join(ns, "slice").crossJoin(broadcast(m))
      .withColumn("d", col("g") - col("c"))
      .withColumn("n2", col("m_total") - col("n1"))
      .withColumn("p_term", when(col("d") > 0, expr(
        s"CAST(c * (${l2("2 * c * n2")} - ${l2("c * n2 + d * n1")}) AS DECIMAL(38,0))"))
        .otherwise(expr("CAST(c AS DECIMAL(38,0)) * 1024")))
      .withColumn("q_term", when(col("d") > 0, expr(
        s"CAST(d * (${l2("2 * d * n1")} - ${l2("c * n2 + d * n1")}) AS DECIMAL(38,0))"))
        .otherwise(lit(0).cast("decimal(38,0)")))
    terms.groupBy("slice")
      .agg(first("n1").as("n_slice"), first("n2").as("n_rest"),
        sum("p_term").as("sp"), sum("q_term").as("sq"),
        // rest mass on terms the slice lacks: N2 − Σ_{slice terms} d,
        // each such token contributing exactly 1024 to the Q-sum
        (first("n2") - sum("d")).as("d_only"))
      .select(col("slice"), col("n_slice"), col("n_rest"),
        when(col("n_rest") > 0, expr(
          "CAST(sp div (2 * n_slice) + " +
            "(sq + CAST(d_only AS DECIMAL(38,0)) * 1024) div (2 * n_rest) AS BIGINT)"))
          .as("js_q10"))
  }

  def entropyKl(tokens: DataFrame, sliceCol: Column, tokenCol: Column): DataFrame = {
    val base = tokens.select(sliceCol.as("slice"), tokenCol.as("tok"))
    val c = base.groupBy("slice", "tok").agg(count(lit(1)).as("c"))
    val ns = c.groupBy("slice").agg(sum("c").cast("long").as("n_s"))
    val g = c.groupBy("tok").agg(sum("c").cast("long").as("g"))
    val m = g.agg(sum("g").cast("long").as("m_total"))
    val l2 = graft.operators.Search.log2q10Sql _
    c.join(ns, "slice").join(g, "tok").crossJoin(broadcast(m))
      .withColumn("h_term", expr(
        s"CAST(c * (${l2("n_s")} - ${l2("c")}) AS DECIMAL(38,0))"))
      .withColumn("kl_term", expr(
        s"CAST(c * ((${l2("c")} - ${l2("n_s")}) - (${l2("g")} - ${l2("m_total")})) AS DECIMAL(38,0))"))
      .groupBy("slice")
      .agg(first("n_s").as("n_tokens"), count(lit(1)).as("n_distinct"),
        sum("h_term").as("sh"), sum("kl_term").as("sk"))
      .select(col("slice"), col("n_tokens"), col("n_distinct"),
        expr("CAST(sh div n_tokens AS BIGINT)").as("h_q10"),
        when(col("n_distinct") > 1, expr(
          s"CAST(1000 * (sh div n_tokens) div (${graft.operators.Search.log2q10Sql("n_distinct")}) AS BIGINT)"))
          .as("h_norm_pm"),
        expr("CAST(sk div n_tokens AS BIGINT)").as("kl_q10"))
  }
}
