package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C139: frequent-pair ASSOCIATION RULES — classic market-basket mining
 * (Agrawal & Srikant 1994's support/confidence frame plus lift), the
 * directional upgrade over the co-occurrence EDGES the graph suite
 * consumes: an edge says "bought together", a rule says "x ⇒ y with
 * this confidence, lifting y's base rate this much" — the form a
 * recommendation or curation policy actually reads.
 *
 * Everything exact integer: support in ppm of baskets, confidence in
 * ppm of the antecedent's baskets, lift in per-mille as
 * `1000·pair·N div (ante·cons)` with the triple product in
 * DECIMAL(38,0) (pair·N alone can pass int64 at warehouse scale).
 *
 * Scale shape: baskets dedup to (basket, item); the APRIORI property
 * prunes items below min support BEFORE the pair join (the only
 * quadratic-risk step, and its expansion is bounded by the pruned
 * per-basket degree); pair counts shuffle on the item pair; the rule
 * expansion is pair-frame-sized. Never all-pairs over items that
 * cannot reach min support.
 */
object Associations {

  /** Frequent-pair rules at `minSupport` basket count and `minConfPm`
    * confidence, both directions of every surviving pair.
    * @param baskets (basket, item) rows; duplicates ignored.
    * @return (antecedent, consequent, pair_n, ante_n, cons_n,
    *         support_ppm, conf_ppm, lift_pm). */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
                minSupport: Long = 2L, minConfPm: Long = 0L): DataFrame = {
    require(minSupport >= 1 && minConfPm >= 0 && minConfPm <= 1000000)
    val b = baskets.select(col(basketCol).as("basket"), col(itemCol).as("item")).distinct()
    val n = b.agg(countDistinct("basket").as("n_baskets"))
    val itemCnt = b.groupBy("item").agg(count(lit(1)).as("cnt"))
    // apriori: a pair cannot reach minSupport unless both items do
    val frequent = itemCnt.filter(col("cnt") >= minSupport)
    val fb = b.join(frequent.select("item"), Seq("item"), "left_semi")
    val pairs = fb.as("x").join(fb.as("y"),
        col("x.basket") === col("y.basket") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("ia"), col("y.item").as("ib"))
      .agg(count(lit(1)).as("pair_n"))
      .filter(col("pair_n") >= minSupport)
    val rules = pairs.select(col("ia").as("antecedent"), col("ib").as("consequent"), col("pair_n"))
      .unionByName(pairs.select(col("ib").as("antecedent"), col("ia").as("consequent"), col("pair_n")))
    rules
      .join(frequent.select(col("item").as("antecedent"), col("cnt").as("ante_n")), "antecedent")
      .join(frequent.select(col("item").as("consequent"), col("cnt").as("cons_n")), "consequent")
      .crossJoin(broadcast(n))
      .withColumn("support_ppm", expr("1000000 * pair_n div n_baskets"))
      .withColumn("conf_ppm", expr("1000000 * pair_n div ante_n"))
      .withColumn("lift_pm", expr(
        "CAST(CAST(1000 AS DECIMAL(38,0)) * pair_n * n_baskets div " +
          "(CAST(ante_n AS DECIMAL(38,0)) * cons_n) AS BIGINT)"))
      .filter(col("conf_ppm") >= minConfPm)
      .select("antecedent", "consequent", "pair_n", "ante_n", "cons_n",
        "support_ppm", "conf_ppm", "lift_pm")
  }
}
