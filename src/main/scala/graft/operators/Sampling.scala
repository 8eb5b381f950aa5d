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

  /** C61: LEAKAGE-SAFE train/val/test split — the hash split keyed by
    * near-dup CLUSTER instead of document: every member of a cluster
    * lands in its canonical's split, so near-duplicates can never
    * straddle train and test (the classic eval-inflation leak that
    * per-document splitting allows: a test doc whose near-twin sits in
    * train scores as memorization, not generalization). `clusters` is
    * [[Dedup.resolveClusters]] output (doc_id, cluster_id); documents in
    * no cluster split by their own id — identical to [[hashSplit]] for
    * the non-duplicated majority, so adopting cluster-safety never
    * reshuffles singleton assignments.
    *
    * Scale: one left join on doc_id (clusters ≪ corpus), then the same
    * per-row md5 arithmetic as hashSplit — no extra shuffle beyond the
    * join, assignments stable under reruns and appends. */
  def leakageSafeSplit(df: DataFrame, clusters: DataFrame, idCol: String = "doc_id",
                       trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val keyed = df.join(clusters, Seq(idCol), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    keyed.withColumn("bucket", pctBucket(col("cluster_id")))
      .withColumn("split", splitCol(col("bucket"), trainPct, valPct))
  }

  /** Stable per-key bucket in [0, 10000) — pctBucket at 0.01% granularity,
    * for fraction thresholds finer than whole percents. */
  def bucket10k(key: Column): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long"), lit(10000L))

  /** Full 60-bit stable rank hash (uniform order key for sampling ranks). */
  def rankHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")

  /** C21: deterministic stratified Bernoulli sample — each stratum keeps
    * its own fraction (granularity 1/10000) of rows, selected by the
    * stable per-key hash. Pure per-row arithmetic: no shuffle, no RNG
    * state, assignments survive reruns/appends, and any engine replays
    * them (q67's DuckDB oracle re-derives the same md5 buckets). Strata
    * missing from `fractions` are dropped (fraction 0). */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions in [0,1]")
    val threshold = fractions.foldLeft(lit(0)) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, lit((f * 10000).round.toInt)).otherwise(acc)
    }
    df.filter(bucket10k(col(idCol)) < threshold)
  }

  /** C29: DOMAIN-MIXTURE resampling — the data-mixing step of a training
    * pipeline: given RELATIVE integer weights per source (unlisted
    * sources weigh `defaultWeight`), compute the largest mixture
    * achievable by pure downsampling (T = min over sources of
    * n_s / d_s with d_s = w_s / Σw — never upsamples), derive each
    * source's sampling fraction f_s = d_s·T / n_s, and keep rows by the
    * stable hash bucket (granularity 1/10000).
    *
    * Everything stays IN-PLAN: per-source counts are a tiny aggregate,
    * joined back via two 1-row broadcasts (the q43 scalar pattern) — no
    * driver collect, so the same code runs over 10^12 rows. Integer
    * weights keep Σw exact; every double op is a fixed-order division/
    * multiply of exact operands, so the q78 oracle replays fractions and
    * membership bit-for-bit. */
  def mixtureSample(df: DataFrame, sourceCol: String, idCol: String,
                    weights: Map[String, Int], defaultWeight: Int = 1): DataFrame = {
    require(weights.values.forall(_ >= 0) && defaultWeight >= 0, "weights must be >= 0")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, ww)) =>
      when(col(sourceCol) === s, lit(ww)).otherwise(acc)
    }.cast("long")
    val counts = df.groupBy(sourceCol)
      .agg(count(lit(1)).as("__n")).withColumn("__w", w)
    sampleByWeights(df, sourceCol, idCol, counts)
  }

  /** C56: TEMPERATURE-flattened mixture (the T=2 source-rebalancing
    * recipe: sampling shares ∝ n_s^(1/T) instead of n_s, so head domains
    * shrink and tail domains survive — the standard multi-source
    * rebalance). Weights are DATA-DERIVED in-plan — `round(sqrt(n_s))`
    * on the tiny per-source count frame, no driver collect, no config —
    * then the same largest-downsampling-only mixture machinery as C29.
    * sqrt is IEEE-correctly-rounded in both engines, and the rounded
    * weight is integer, so the whole derivation replays exactly. */
  def temperatureMixture(df: DataFrame, sourceCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(sourceCol).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double")) + lit(0.5)).cast("long"))
    sampleByWeights(df, sourceCol, idCol, counts)
  }

  /** Shared mixture tail: counts(sourceCol, __n, __w) → sampled rows. */
  private def sampleByWeights(df: DataFrame, sourceCol: String, idCol: String,
                              counts: DataFrame): DataFrame = {
    val sumw = counts.agg(sum(col("__w")).as("__sumw"))
    val withShare = counts.crossJoin(broadcast(sumw))
      .withColumn("__d", col("__w").cast("double") / col("__sumw").cast("double"))
    val cap = withShare.agg(min(col("__n").cast("double") / col("__d")).as("__cap"))
    val thresholds = withShare.crossJoin(broadcast(cap))
      .withColumn("__thr", floor(col("__d") * col("__cap") / col("__n").cast("double")
        * lit(10000.0) + lit(0.5)).cast("long"))
      .select(col(sourceCol).as("__src"), col("__thr"))
    // Null-safe equality: a NULL source is a legitimate stratum — the counts
    // aggregate above already gave it `defaultWeight`, so a plain equi-join
    // (never matching NULL) would silently drop those rows from the output
    // while still letting them shrink every other source's cap. `<=>` keeps
    // the accounting consistent: NULL-source rows are sampled at their
    // threshold like any other stratum.
    df.join(broadcast(thresholds), col(sourceCol) <=> col("__src"))
      .filter(bucket10k(col(idCol)) < col("__thr"))
      .drop("__src", "__thr")
  }

  /** C22: deterministic fixed-size sample per stratum ("reservoir" shape):
    * the k rows with the smallest stable rank hash in each stratum — a
    * uniform-without-replacement sample that is reproducible across
    * engines and reruns.
    *
    * Scale design: a single `Window.partitionBy(stratum)` would funnel a
    * whole stratum through one task, so selection is TWO-PHASE top-k —
    * phase 1 takes the per-(stratum, salt) top k over `salts` deterministic
    * salt lanes (every window partition is ~rows/(strata x salts)), phase 2
    * re-ranks only the <= salts x k survivors per stratum, a by-construction
    * bounded partition (the q17/pre-aggregated-window pattern). The
    * two-phase result is EXACTLY the one-phase top-k (phase 1 keeps every
    * stratum-wide winner: a row in the stratum top-k is also in its own
    * lane's top-k), which is what the q68 oracle replays one-phase. */
  def reservoirPerStratum(df: DataFrame, stratumCol: String, idCol: String,
                          k: Int, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0)
    val h = rankHash(col(idCol))
    // salt lane from an INDEPENDENT hash (suffix-tagged key), so lane
    // membership doesn't correlate with rank order
    val lane = pmod(conv(substring(md5(concat(col(idCol).cast("string"), lit("#lane"))), 1, 15),
      16, 10).cast("long"), lit(salts.toLong))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__lane")).orderBy(col("__h").asc, col(idCol).asc)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__h").asc, col(idCol).asc)
    df.withColumn("__h", h).withColumn("__lane", lane)
      .withColumn("__rn1", row_number().over(w1)).filter(col("__rn1") <= k)
      .withColumn("sample_rank", row_number().over(w2).cast("long"))
      .filter(col("sample_rank") <= k)
      .drop("__h", "__lane", "__rn1")
  }

  /** C34: GROUP FREQUENCY CAP — "at most `cap` documents per domain/
    * source", the corpus-balancing guard against a handful of spammy
    * domains dominating the training mix. Selection is the deterministic
    * smallest-`cap` stable rank hashes per group, so the kept set is
    * uniform within each over-cap group, reproducible across reruns and
    * engines, and groups at-or-under cap pass through untouched.
    *
    * Mechanically this IS [[reservoirPerStratum]] (same salted two-phase
    * top-k — no group ever funnels through a single window task); the cap
    * is the sampling semantics turned inside out: n_s <= cap keeps
    * everything, n_s > cap keeps exactly cap. Kept deliberately as a
    * named operator so pipelines read as policy ("cap per domain"), and
    * so the output drops the rank column samplers want but caps don't. */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String, cap: Int): DataFrame =
    reservoirPerStratum(df, groupCol, idCol, cap).drop("sample_rank")

  /** C66: PRIORITY sampling (Duffield–Lund–Thorup 2007) — WEIGHTED
    * sampling without replacement per stratum, the principled version of
    * "keep k docs but prefer the heavy/high-quality ones": each row gets
    * priority q_i = w_i / u_i with u_i uniform in (0,1], the k highest
    * priorities are the sample, and the (k+1)-th priority τ makes the
    * sample UNBIASED for weighted totals via the Horvitz–Thompson weight
    * ŵ_i = max(w_i, τ) (Σ ŵ over the sample estimates Σ w over the
    * stratum with minimal variance among k-sample schemes — the estimator
    * a downstream mixture/token accountant needs when it only sees the
    * sample). u_i = (stable 60-bit md5 rank + 1) / 2^60, so membership is
    * deterministic, survives reruns/appends, and any engine replays it;
    * q_i is ONE IEEE division of exact integers — bit-identical
    * cross-engine, ties broken by id.
    *
    * Scale design: same salted TWO-PHASE top-k as [[reservoirPerStratum]]
    * (phase 1 keeps k+1 per (stratum, lane) — a stratum-wide top-(k+1)
    * row is also in its own lane's top-(k+1) — phase 2 re-ranks the
    * ≤ salts·(k+1) survivors), so no stratum ever funnels through one
    * window task. τ rides the same bounded survivor frame; rows in
    * strata with ≤ k rows keep ŵ_i = w_i (τ undefined → no clamping). */
  def prioritySample(df: DataFrame, stratumCol: String, idCol: String, weightCol: String,
                     k: Int, salts: Int = 32): DataFrame = {
    require(k > 0 && salts > 0)
    val u = rankHash(col(idCol)) + lit(1L) // 1 .. 2^60: never zero
    val lane = pmod(conv(substring(md5(concat(col(idCol).cast("string"), lit("#lane"))), 1, 15),
      16, 10).cast("long"), lit(salts.toLong))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol), col("__lane"))
      .orderBy(col("__q").desc, col(idCol).asc)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__q").desc, col(idCol).asc)
    val survivors = df
      .withColumn("__w", col(weightCol).cast("long"))
      .withColumn("__q", col("__w").cast("double") / (u.cast("double") / lit(math.pow(2.0, 60))))
      .withColumn("__lane", lane)
      .withColumn("__rn1", row_number().over(w1)).filter(col("__rn1") <= k + 1)
      .withColumn("sample_rank", row_number().over(w2).cast("long"))
      .filter(col("sample_rank") <= k + 1)
    // τ = the (k+1)-th priority; strata smaller than k+1 rows have none
    val tau = survivors.filter(col("sample_rank") === k + 1)
      .select(col(stratumCol), col("__q").as("tau"))
    survivors.filter(col("sample_rank") <= k)
      .join(broadcast(tau), Seq(stratumCol), "left_outer")
      .select(col(stratumCol), col(idCol), col("__w").as("weight"), col("sample_rank"),
        col("tau"), greatest(col("__w").cast("double"), coalesce(col("tau"), lit(0.0)))
          .as("ht_weight"))
  }

  /** C46: token-budget SELECTION — greedily take rows in (priority DESC,
    * id ASC) order until the weight budget is exhausted: a row is kept
    * iff the exact sum of weights of all strictly-better rows is still
    * below `budget` (so the row that crosses the budget is the last one
    * in). This is "pick the best docs until N tokens", the data-selection
    * step before pretraining.
    *
    * Scale: the one-phase form is a GLOBAL window over a data-dependent
    * order — one task. Here it is the C33 two-level scan transplanted to
    * priority order: integer priorities bucket by `priority div
    * granularity`; a per-BUCKET weight rollup (tiny: #buckets rows)
    * yields each bucket's exclusive better-side total; whole buckets past
    * the budget are PRUNED before any window runs; surviving rows rank
    * inside their own bucket partition only. Exactly equal to the global
    * window (bucket order refines priority order; ties cross buckets
    * never). Degenerate distributions (everything in one bucket) degrade
    * to the single-task form — pick `granularity` so buckets are small,
    * the same contract as AQE skew handling.
    *
    * Priorities must be integral (exact, cross-engine); weights cast to
    * long. */
  def selectUntilBudget(df: DataFrame, priorityCol: String, weightCol: String,
                        idCol: String, budget: Long, granularity: Long = 1024L): DataFrame = {
    require(budget >= 0 && granularity >= 1)
    val w = org.apache.spark.sql.expressions.Window
    val base = df.select(col(idCol), col(priorityCol), col(weightCol).cast("long").as("__w"))
      .withColumn("__bkt", expr(s"$priorityCol div $granularity"))
    val wB = w.orderBy(col("__bkt").desc)
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    val offsets = base.groupBy("__bkt").agg(sum(col("__w")).as("__tot"))
      .withColumn("__before", sum(col("__tot")).over(wB) - col("__tot"))
      .select("__bkt", "__before")
    val wD = w.partitionBy("__bkt")
      .orderBy(col(priorityCol).desc, col(idCol).asc)
      .rowsBetween(w.unboundedPreceding, w.currentRow)
    base.join(broadcast(offsets), "__bkt")
      .filter(col("__before") < budget) // prune whole out-of-budget buckets pre-window
      .withColumn("__pe", sum(col("__w")).over(wD) - col("__w"))
      .filter(col("__before") + col("__pe") < budget)
      .select(col(idCol), col(priorityCol), col("__w").as(weightCol))
  }

  /** C70: token-budget WATER-FILLING mixture planner — the allocation step
    * of multi-source training-data assembly: give every domain an EQUAL
    * share of a token budget, except that no domain may repeat beyond its
    * per-domain epoch cap; capped domains saturate and their unused share
    * redistributes to the rest (the classic water-filling solution).
    *
    * Exact integer semantics, defined by the sorted CLOSED FORM rather
    * than the iterative redistribution loop (provably identical in exact
    * arithmetic — `SamplingSpec` pins them against each other): rank
    * domains by (cap ASC, domain ASC); rank-j saturates iff
    * `cap_j·(N−j+1) + P_{j−1} < B` (P = cap prefix sum), a prefix-monotone
    * condition; the water level is `(B − Σ_sat cap) div (N − j*)` with the
    * `mod` remainder granted +1 token to the first `rem` unsaturated
    * domains in domain order — so the allocation sums to B exactly and
    * both engines replay it bit-for-bit. If B exceeds the total cap
    * (infeasible budget), every domain saturates and the result is the
    * MAX-FEASIBLE allocation Σcap — visible as `saturated` on every row,
    * not a silent partial fill of B.
    *
    * Scale (100 TB): the corpus collapses to the DOMAIN frame (bounded by
    * distinct sources) in one map-side-partial scan; the sort, windows and
    * solver all run on that tiny frame; totals ride 1-row broadcasts — no
    * driver collect, no iteration, no corpus-sized shuffle.
    *
    * @param capFactor integer epoch-cap multiplier, evaluated against the
    *        `domain` column (e.g. `lit(2)` for a uniform 2-epoch cap).
    * @param budgetNumer/budgetDenom budget as a fraction of total corpus
    *        tokens: B = T·numer div denom.
    */
  def budgetWaterfill(docs: DataFrame, domainCol: String = "source",
                      textCol: String = "text", capFactor: Column,
                      budgetNumer: Int = 2, budgetDenom: Int = 1): DataFrame = {
    require(budgetNumer >= 1 && budgetDenom >= 1)
    val w = org.apache.spark.sql.expressions.Window
    val byCap = w.orderBy(col("cap").asc, col("domain").asc)
    val dom = docs
      .select(col(domainCol).as("domain"),
        size(split(col(textCol), " ")).cast("long").as("__nt"))
      .groupBy("domain").agg(sum("__nt").as("n_tokens"))
      .withColumn("cap", col("n_tokens") * capFactor.cast("long"))
    val tot = dom.agg(sum("n_tokens").as("t_tokens"),
      count(lit(1)).as("n_domains"))
    val ranked = dom.crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"t_tokens * $budgetNumer div $budgetDenom"))
      .withColumn("rk", row_number().over(byCap).cast("long"))
      .withColumn("pcap", sum(col("cap"))
        .over(byCap.rowsBetween(w.unboundedPreceding, w.currentRow)))
      .withColumn("sat",
        col("cap") * (col("n_domains") - col("rk") + 1) +
          (col("pcap") - col("cap")) < col("budget"))
    val satAgg = ranked.agg(
      coalesce(max(when(col("sat"), col("rk"))), lit(0L)).as("jstar"),
      coalesce(sum(when(col("sat"), col("cap"))), lit(0L)).as("satcap"))
    ranked.crossJoin(broadcast(satAgg))
      .withColumn("active_n", col("n_domains") - col("jstar"))
      .withColumn("level", when(col("active_n") > 0,
        expr("(budget - satcap) div active_n")).otherwise(lit(0L)))
      .withColumn("rem", when(col("active_n") > 0,
        expr("(budget - satcap) % active_n")).otherwise(lit(0L)))
      .withColumn("saturated", col("rk") <= col("jstar"))
      .withColumn("rku", row_number()
        .over(w.partitionBy("saturated").orderBy("domain")).cast("long"))
      .withColumn("allocation", when(col("saturated"), col("cap"))
        .otherwise(col("level") +
          when(col("rku") <= col("rem"), 1L).otherwise(0L)))
      // two-term split of allocation·10^6 div n_tokens — exactly equal
      // (allocation = q·n + r ⇒ the q·n term divides out), but the only
      // multiply is r·10^6 with r < n_tokens, so the fixed-point column
      // stays overflow-free up to ~9·10^12 tokens PER DOMAIN (≈36 TB of
      // text) instead of ~9·10^12 ÷ capFactor total allocation
      .withColumn("epochs_fp",
        expr("(allocation div n_tokens) * 1000000 + " +
          "(allocation % n_tokens) * 1000000 div n_tokens"))
      .select("domain", "n_tokens", "cap", "saturated", "allocation",
        "epochs_fp")
  }

  /** C71: mixture-schedule MATERIALIZATION — turn [[budgetWaterfill]]'s
    * per-domain token allocation into the per-DOCUMENT repetition plan a
    * training-data assembly job actually executes: every document of a
    * domain appears `allocation div dom_tokens` times (full epochs), and
    * the `allocation mod dom_tokens` remainder is one PARTIAL epoch — the
    * hash-ordered document prefix whose preceding cumulative token count
    * is still below the remainder (the C46 token-budget boundary rule, so
    * the boundary document rounds the remainder UP; deterministic, no RNG).
    *
    * Scale (100 TB): the plan side is the C70 solve (domain-frame only);
    * the schedule side is ONE corpus-frame pass — a per-domain window over
    * (hash, id) for the prefix sum, then a broadcast join of the
    * domain-sized plan. No document text moves: only (id, domain, token
    * count) triples shuffle into the window. */
  def mixtureSchedule(docs: DataFrame, domainCol: String = "source",
                      idCol: String = "doc_id", textCol: String = "text",
                      capFactor: Column,
                      budgetNumer: Int = 2, budgetDenom: Int = 1): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val plan = budgetWaterfill(docs, domainCol, textCol, capFactor,
        budgetNumer, budgetDenom)
      .select(col("domain"), col("n_tokens").as("dom_tokens"), col("allocation"))
    val byHash = w.partitionBy("domain").orderBy(col("rh").asc, col(idCol).asc)
    docs
      .select(col(idCol), col(domainCol).as("domain"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("rh", rankHash(col(idCol)))
      .join(broadcast(plan), Seq("domain"))
      .withColumn("epochs_full", expr("allocation div dom_tokens"))
      .withColumn("rem", expr("allocation % dom_tokens"))
      .withColumn("before", coalesce(
        sum(col("n_tokens")).over(
          byHash.rowsBetween(w.unboundedPreceding, -1)), lit(0L)))
      .withColumn("partial", col("before") < col("rem"))
      .withColumn("n_copies",
        col("epochs_full") + when(col("partial"), 1L).otherwise(0L))
      .select(col(idCol), col("domain"), col("n_tokens"),
        col("epochs_full"), col("partial"), col("n_copies"))
  }

  /** C143: 2-criteria PARETO-FRONT (skyline) selection — the
    * multi-objective complement of the single-score selectors
    * (selectUntilBudget ranks by ONE priority; k-center/MMR optimize
    * coverage/diversity): keep exactly the rows no other row beats on
    * BOTH axes ("you cannot get more of x without giving up y") — the
    * efficient frontier a curation policy picks from when two quality
    * signals genuinely conflict (length vs lexical diversity, quality
    * vs recency).
    *
    * Semantics (maximize both): a row is dominated iff some row has
    * x' ≥ x AND y' ≥ y with at least one strict; ties ON THE FRONT
    * survive together (equal points never dominate each other).
    *
    * Scale shape — the Zipf/equi-depth two-level discipline: the corpus
    * collapses to the DISTINCT-X frame (one map-side-partial max(y) per
    * x — sized by the x value domain, not the corpus), the running
    * strictly-greater-x maximum runs on that frame alone (the one
    * single-task window, value-domain-bounded by design), and the
    * verdict broadcast-joins back so rows never sort globally. Front
    * membership is then pure per-row arithmetic:
    * on-front ⇔ y == max_y(x) AND y > cummax_y(x' > x).
    *
    * @param df one row per candidate.
    * @return the input rows on the front, plus (__x, __y) used. */
  def paretoFront(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val base = df.withColumn("__x", xCol.cast("long"))
      .withColumn("__y", yCol.cast("long"))
    val byX = base.groupBy("__x").agg(max(col("__y")).as("__my"))
    val wDesc = w.partitionBy(lit(1)).orderBy(col("__x").desc)
      .rowsBetween(w.unboundedPreceding, -1)
    val verdict = byX
      .withColumn("__cm", max(col("__my")).over(wDesc))
      // an x level survives iff its best y strictly beats every best y
      // at strictly larger x — otherwise the whole level is dominated
      .filter(col("__cm").isNull || col("__my") > col("__cm"))
      .select(col("__x"), col("__my"))
    base.join(broadcast(verdict), Seq("__x"))
      .filter(col("__y") === col("__my"))
      .drop("__my")
  }
}
