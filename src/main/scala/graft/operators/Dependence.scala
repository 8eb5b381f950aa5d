package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C141/C142: CATEGORICAL-DEPENDENCE audits — the contingency-table pair
 * the drift/shape family doesn't cover. KS (C99) compares one ORDINAL
 * metric across slices, TVD (B43) compares pre-binned shares, KL (C131)
 * measures a slice against the corpus mixture; none answers "are these
 * two CATEGORICAL columns independent, and how strongly do they move
 * together":
 *
 *  - CHI-SQUARE independence + Cramér's V (C141): the classic
 *    contingency test over the dense level×level grid,
 *    χ² = Σ_cells (o·N − r·c)² / (N·r·c), reported per-million with
 *    per-cell truncating division so both engines replay bit-for-bit
 *    (the quantized-contract discipline of the q10 logs). Cramér's V²
 *    = χ² / (N·min(R−1, C−1)) normalizes it to a [0,1] association
 *    strength comparable across table shapes — the "is language mix
 *    actually independent of source" dataset-card scalar.
 *
 *  - MUTUAL INFORMATION (C142): the information-theoretic strength of
 *    the same dependence, I(X;Y) = Σ p(x,y)·log(p(x,y)/(p(x)p(y))), in
 *    exact q10 fixed-point bits via [[Search.log2q10Sql]] — the
 *    LEAKAGE audit ("does this feature leak the label / the split?")
 *    feature-selection reads, normalized by min(H(X), H(Y)) so 1000
 *    means "fully determined". Runs PER FEATURE over a stacked
 *    (feature, x, y) frame — one pass profiles every candidate column.
 *
 * Scale shape: one corpus scan reduces to the (x × y) cell frame —
 * sized by the CATEGORY DOMAINS, not the corpus (the ksDrift grid
 * discipline); margins/totals are aggregations of that frame and the
 * dense grid is a margin×margin cross of two category-sized frames.
 * Everything downstream of the first aggregation is cell-frame work.
 *
 * Overflow contract (C141): the per-cell numerator (o·N − r·c)²·10⁶
 * rides DECIMAL(38,0), so N is bounded by N⁴·10⁶ < 10³⁸ ⇒ N ≲ 10⁸
 * rows. Past that, audit per slice or over a deterministic sample
 * (C21) — a contingency test's power saturates long before 10⁸ rows.
 */
object Dependence {

  /** C141: chi-square independence audit of two categorical columns,
    * with Cramér's V and the worst (most dependence-carrying) cell.
    *
    * @return ONE row: (n_rows, x_levels, y_levels, dof, chi2_ppm,
    *         v2_ppm, worst_x, worst_y, worst_term_ppm) — chi2_ppm =
    *         10⁶·χ² (per-cell truncating), v2_ppm = 10⁶·V² =
    *         chi2_ppm div (N·min(R−1,C−1)) (NULL for a single-level
    *         side), worst cell = the largest per-cell term (ties:
    *         smallest x, then y). */
  def chiSquare(df: DataFrame, xCol: Column, yCol: Column): DataFrame =
    chiSquareFromCells(
      df.select(xCol.cast("string").as("x"), yCol.cast("string").as("y"))
        .groupBy("x", "y").agg(count(lit(1)).as("o")))

  /** [[chiSquare]] from a pre-aggregated (x, y, o) cell frame — the
    * entry point incremental maintenance uses (cell counts are ADDITIVE,
    * so a maintained cell frame is exactly the one-shot contingency of
    * all data so far; D35 re-prices dependence from it per version). */
  def chiSquareFromCells(cells: DataFrame): DataFrame = {
    val rm = cells.groupBy("x").agg(sum("o").cast("long").as("r"))
    val cm = cells.groupBy("y").agg(sum("o").cast("long").as("c"))
    val n = cells.agg(sum("o").cast("long").as("n"),
      count_distinct(col("x")).as("x_levels"),
      count_distinct(col("y")).as("y_levels"))
    // dense level×level grid: a missing cell is a full expected-count
    // deficit (term = r·c div N·…), not a missing row
    val grid = rm.crossJoin(cm).join(cells, Seq("x", "y"), "left")
      .crossJoin(broadcast(n))
      .withColumn("o", coalesce(col("o"), lit(0L)))
      .withColumn("term_ppm", expr(
        """cast((cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          |     * (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)
          |     * 1000000 div (cast(n as decimal(38,0)) * r * c)
          |   as decimal(38,0))""".stripMargin))
    val wPick = Window.partitionBy(lit(1))
      .orderBy(col("term_ppm").desc, col("x").asc, col("y").asc)
    grid.withColumn("rk", row_number().over(wPick))
      .groupBy(lit(1).as("__g"))
      .agg(max("n").as("n_rows"),
        max("x_levels").as("x_levels"), max("y_levels").as("y_levels"),
        sum("term_ppm").as("chi2_sum"),
        max(when(col("rk") === 1, col("x"))).as("worst_x"),
        max(when(col("rk") === 1, col("y"))).as("worst_y"),
        max(when(col("rk") === 1, col("term_ppm").cast("long"))).as("worst_term_ppm"))
      .select(col("n_rows"), col("x_levels"), col("y_levels"),
        ((col("x_levels") - 1) * (col("y_levels") - 1)).as("dof"),
        col("chi2_sum").cast("long").as("chi2_ppm"),
        when(col("x_levels") > 1 && col("y_levels") > 1, expr(
          "cast(chi2_sum div (cast(n_rows as decimal(38,0)) * least(x_levels - 1, y_levels - 1)) as long)"))
          .as("v2_ppm"),
        col("worst_x"), col("worst_y"), col("worst_term_ppm"))
  }

  /** C142: per-feature mutual information I(X;Y) in q10 fixed-point
    * bits, with the marginal entropies and the min-entropy-normalized
    * strength — the leakage profile over a stacked candidate-feature
    * frame.
    *
    * Only observed cells contribute (the 0·log0 = 0 convention is
    * exact here, unlike χ² where absent cells still carry expected
    * mass). Per-term q10 quantization bounds each contribution's error
    * below 2⁻¹⁰ bit — MI may read slightly negative near independence;
    * that is the documented contract shared with C131's KL.
    *
    * @param stacked one row per observation per feature:
    *                (featureCol, xCol, yCol).
    * @return one row per feature: (feature, n_rows, x_levels, y_levels,
    *         mi_q10, hx_q10, hy_q10, nmi_pm) — nmi_pm =
    *         1000·Σmi div min(Σhx, Σhy) on the shared pre-division
    *         numerators (NULL when either side is constant). */
  def mutualInfo(stacked: DataFrame, featureCol: Column, xCol: Column,
                 yCol: Column): DataFrame = {
    val base = stacked.select(featureCol.as("f"),
      xCol.cast("string").as("x"), yCol.cast("string").as("y"))
    val cells = base.groupBy("f", "x", "y").agg(count(lit(1)).as("o"))
    val rm = cells.groupBy("f", "x").agg(sum("o").cast("long").as("r"))
    val cm = cells.groupBy("f", "y").agg(sum("o").cast("long").as("c"))
    val n = cells.groupBy("f").agg(sum("o").cast("long").as("n"))
    val l2 = Search.log2q10Sql _
    val mi = cells.join(rm, Seq("f", "x")).join(cm, Seq("f", "y"))
      .join(n, Seq("f"))
      .withColumn("mi_term", expr(
        s"CAST(o * ((${l2("o")} + ${l2("n")}) - (${l2("r")} + ${l2("c")})) AS DECIMAL(38,0))"))
      .groupBy("f").agg(sum("mi_term").as("smi"),
        count_distinct(col("x")).as("x_levels"),
        count_distinct(col("y")).as("y_levels"))
    val hx = rm.join(n, Seq("f"))
      .withColumn("h_term", expr(
        s"CAST(r * (${l2("n")} - ${l2("r")}) AS DECIMAL(38,0))"))
      .groupBy("f").agg(sum("h_term").as("shx"))
    val hy = cm.join(n, Seq("f"))
      .withColumn("h_term", expr(
        s"CAST(c * (${l2("n")} - ${l2("c")}) AS DECIMAL(38,0))"))
      .groupBy("f").agg(sum("h_term").as("shy"))
    mi.join(hx, Seq("f")).join(hy, Seq("f")).join(n, Seq("f"))
      .select(col("f").as("feature"), col("n").as("n_rows"),
        col("x_levels"), col("y_levels"),
        expr("CAST(smi div n AS BIGINT)").as("mi_q10"),
        expr("CAST(shx div n AS BIGINT)").as("hx_q10"),
        expr("CAST(shy div n AS BIGINT)").as("hy_q10"),
        when(least(col("shx"), col("shy")) > 0,
          expr("CAST(1000 * smi div least(shx, shy) AS BIGINT)"))
          .as("nmi_pm"))
  }

  /** C154: WEIGHT OF EVIDENCE + INFORMATION VALUE — credit scoring's
    * standard categorical-feature audit (the companion every PSI sheet
    * carries: PSI watches a DISTRIBUTION drift, WOE/IV scores a
    * FEATURE's separation power over a binary target):
    *
    *   WOE_i = log(p_pos_i / p_neg_i),   IV = Σ_i (p_pos_i − p_neg_i)·WOE_i
    *
    * with p_pos_i the category's share of all POSITIVE rows (p_neg of
    * negatives). Same exact-integer construction as C151's PSI: Laplace
    * +1 smoothed counts (empty cells are routine in sparse categories),
    * shares in exact ppm, the log as the q10 fixed-point binary log —
    * WOE in q10 BITS, IV in q10·ppm, integers end-to-end so the oracle
    * replays bit-for-bit. The usual IV reading (<0.02 useless, >0.5
    * suspicious) converts via ln2: 0.02 nats ≈ 29.5·10⁶ q10ppm.
    *
    * Scale shape: ONE scan collapses the corpus to the category frame
    * (bounded by the category vocabulary — the q19 discipline); the
    * 1-row totals broadcast back; no window anywhere.
    *
    * @param labelCol boolean target — true rows are the POSITIVE class.
    * @return one row per category: (category, n_pos, n_neg, pos_ppm,
    *         neg_ppm, woe_q10, iv_term_q10ppm, iv_q10ppm) —
    *         iv_q10ppm the total repeated on every row. */
  def woeIv(df: DataFrame, categoryCol: Column, labelCol: Column): DataFrame = {
    val cells = df.select(categoryCol.as("category"), labelCol.as("y"))
      .groupBy("category").agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("g"),
        sum(when(col("y"), 0L).otherwise(1L)).as("b"))
    val k = cells.agg(count(lit(1)).as("n_cats"),
      sum("g").as("tg"), sum("b").as("tb"))
    val l2 = Search.log2q10Sql _
    val terms = cells.crossJoin(broadcast(k))
      .withColumn("gp", col("g") + 1L).withColumn("bp", col("b") + 1L)
      .withColumn("tgp", col("tg") + col("n_cats"))
      .withColumn("tbp", col("tb") + col("n_cats"))
      .withColumn("pos_ppm", expr("1000000 * gp div tgp"))
      .withColumn("neg_ppm", expr("1000000 * bp div tbp"))
      .withColumn("woe_q10", expr(s"${l2("gp * tbp")} - ${l2("bp * tgp")}"))
      .withColumn("iv_term_q10ppm", expr("(pos_ppm - neg_ppm) * woe_q10"))
    val total = terms.agg(sum("iv_term_q10ppm").as("iv_q10ppm"))
    terms.crossJoin(broadcast(total))
      .select(col("category"), col("g").as("n_pos"), col("b").as("n_neg"),
        col("pos_ppm"), col("neg_ppm"), col("woe_q10"),
        col("iv_term_q10ppm"), col("iv_q10ppm"))
  }
}
