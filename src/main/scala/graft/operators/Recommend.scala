package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * B54: ITEM-TO-ITEM co-occurrence recommendations — the classic
 * "people who bought X also bought Y" candidate generator (Amazon's
 * item-item collaborative filtering, Linden et al. 2003), which is also
 * the reverse-ETL payload a "recommendations" destination receives per
 * entity: for every item, the top-k co-basket items ranked by exact
 * integer LIFT (the C152 log-free-PMI discipline on baskets instead of
 * token windows):
 *
 *   lift_ppm = 10⁶ · n_ab · N div (n_a · n_b)
 *
 * with n_ab the number of baskets containing both items, n_a/n_b the
 * per-item basket counts, N total baskets — p(ab)/(p(a)p(b)) in exact
 * ppm (DECIMAL(38,0) products). `minPair` floors co-occurrence before
 * the lift (rare-pair lift is the same instability C152 documents —
 * part of the statistic, not a tuning knob).
 *
 * Scale shape: one scan to the distinct (basket, item) frame; the pair
 * expansion is the C107/q188 per-basket self-join, bounded by basket
 * size; item totals join co-partitioned on the item (NOT broadcast —
 * an item catalog is not a broadcast candidate at retail scale; AQE
 * promotes small ones); the per-item top-k runs through
 * [[Ranking.groupRankDesc]]'s two-level bucketed rank, so a mega-seller
 * co-occurring with half the catalog never funnels one window task.
 *
 * BASKET CAP (enforced, not advisory — the same contract as
 * `Graph.butterflies`' hub cap): a basket of s distinct items expands
 * into s·(s−1) directed pair rows, so ONE mega-basket (a bot session, a
 * shared account spanning half the catalog) is a quadratic blowup no
 * partitioning absorbs. Baskets with more than `maxBasketSize` distinct
 * items are REFUSED ENTIRELY — excluded from N, the item totals, and
 * the pair expansion (a transaction that large is not purchase-affinity
 * signal; everything "co-occurs" in it, the market-basket analog of the
 * ubiquitous-token drop in capped MOSS/ppjoin) — and reported in the
 * output ledger: `n_baskets_capped` and `n_pairs_dropped`
 * (= Σ s·(s−1) over refused baskets, the exact directed expansion that
 * was refused, DECIMAL(38,0) so a 10⁹-item basket cannot overflow it).
 * A zero ledger certifies the counts are exact; a non-zero ledger is a
 * loud, quantified refusal — silent truncation is the failure mode this
 * refuses. The default (1024 ⇒ ≤ ~10⁶ pair rows per basket) sits far
 * above real basket sizes (TPC-H orders are ≤ 7 lines independent of
 * SF) while refusing the hub pathology.
 */
object Recommend {

  /** @param baskets   rows of (basketCol, itemCol) — deduplicated
    *                  internally (an item twice in one basket counts
    *                  once, the standard market-basket convention).
    * @param minPair   co-occurrence floor (>= 1).
    * @param k         recommendations per item.
    * @param maxBasketSize baskets with more distinct items are refused
    *                  and ledgered, never expanded.
    * @return (item, rank, rec, n_ab, n_item, n_rec, lift_ppm,
    *         n_baskets_capped, n_pairs_dropped) — rank 1..k by lift
    *         DESC, ties (n_ab DESC, rec ASC); the last two columns are
    *         the constant refusal ledger. */
  def itemToItem(baskets: DataFrame, basketCol: String, itemCol: String,
                 minPair: Long = 2L, k: Int = 3,
                 maxBasketSize: Long = 1024L): DataFrame = {
    require(minPair >= 1 && k >= 1)
    require(maxBasketSize >= 2, s"maxBasketSize must allow a pair (got $maxBasketSize)")
    val bi0 = baskets.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
      // referenced by the size frame and the semi-join below — the
      // shared-subplan lazy-persist discipline
      .persist()
    val (kept, ledger) = Pairs.capGroups(bi0, "b", maxBasketSize)
    // four references below (N, item totals, both pair sides)
    val bi = kept.persist()
    val n = bi.agg(countDistinct("b").cast("long").as("n_baskets"))
    val items = bi.groupBy(col("i").as("it")).agg(count(lit(1)).as("n_it"))
    // DIRECTED pair frame: each unordered co-occurrence feeds both
    // items' candidate lists
    val pairs = bi.as("x").join(bi.as("y"),
        col("x.b") === col("y.b") && col("x.i") =!= col("y.i"))
      .groupBy(col("x.i").as("item"), col("y.i").as("rec"))
      .agg(count(lit(1)).as("n_ab"))
    scoreFromCounts(pairs, items, n, minPair, k)
      .crossJoin(broadcast(ledger))
      .select(col("item"), col("rank"), col("rec"), col("n_ab"),
        col("n_item"), col("n_rec"), col("lift_ppm"),
        col("n_groups_capped").as("n_baskets_capped"),
        col("pairs_dropped_dec").cast("long").as("n_pairs_dropped"))
  }

  /** The B54 scoring kernel over pre-built count frames — shared by the
    * one-shot [[itemToItem]] and the continuously-maintained monitor
    * (D40, `streaming/EventStreams.itemRecsMonitor`), so "recs from
    * maintained state" equals "recs from the corpus" by construction
    * (the D32/D39 discipline). All three inputs are ADDITIVE counts,
    * which is what makes the streaming face exact.
    *
    * @param pairs (item, rec, n_ab) DIRECTED co-occurrence counts.
    * @param items (it, n_it) per-item basket counts.
    * @param n     ONE row (n_baskets). */
  def scoreFromCounts(pairs: DataFrame, items: DataFrame, n: DataFrame,
                      minPair: Long, k: Int): DataFrame = {
    require(minPair >= 1 && k >= 1)
    val scored = pairs.filter(col("n_ab") >= minPair)
      .join(items.select(col("it").as("item"), col("n_it").as("n_item")), "item")
      .join(items.select(col("it").as("rec"), col("n_it").as("n_rec")), "rec")
      .crossJoin(broadcast(n))
      .withColumn("lift_ppm", expr(
        "cast(cast(1000000 as decimal(38,0)) * n_ab * n_baskets div " +
          "(cast(n_item as decimal(38,0)) * n_rec) as bigint)"))
    // rank by (lift DESC, n_ab DESC, rec ASC): the secondary n_ab order
    // packs under the lift in one DECIMAL key (lift can exceed 2^31 for
    // rare pairs — 10^6·N/n at the extreme — so the pack rides
    // DECIMAL(38,0); n_ab < 2^32 is the documented basket-count bound)
    val packed = scored.withColumn("__score",
      expr("cast(lift_ppm as decimal(38,0)) * 4294967296 + n_ab"))
    Ranking.groupRankDesc(packed, "item", "__score", "rec",
        expr("__score div 4398046511104")) // 2^42-wide buckets: monotone, tie-safe
      .filter(col("rank") <= k)
      .select(col("item"), col("rank"), col("rec"), col("n_ab"),
        col("n_item"), col("n_rec"), col("lift_ppm"))
  }
}
