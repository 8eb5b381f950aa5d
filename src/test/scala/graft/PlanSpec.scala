package graft

import graft.queries.{Events, Relational, ReverseEtl, Tables, TrainingData}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/**
 * Physical-plan assertions — the 100 TB contract (SURVEY §5). A query that
 * returns right answers through a wrong plan (scan without pushdown,
 * shuffle join of a broadcastable dim, full sort for a top-k) fails here.
 */
class PlanSpec extends SparkSuite {

  private lazy val t = Tables(spark, sfDir)

  /** Initial physical plan (inside AQE wrapper) as text. */
  private def plan(df: DataFrame): String = {
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("q01: filter and projection push into the parquet scan") {
    val p = plan(Relational.q01FilterProject(t))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThan(l_shipdate") || p.contains("GreaterThanOrEqual(l_shipdate"), p)
    // projection pruning: scan schema must not include unused money columns
    assert(!p.contains("l_comment"), "unused columns must be pruned")
  }

  test("q02: aggregation is partial (map-side combine before the shuffle)") {
    val p = plan(Relational.q02Agg(t))
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("partial_"), "must contain partial aggregate functions")
  }

  test("q03/q04: dimension joins broadcast, no shuffle of the fact side for dims") {
    assert(plan(Relational.q03JoinAgg(t)).contains("BroadcastHashJoin"))
    val p4 = plan(Relational.q04Multijoin(t))
    assert("BroadcastHashJoin".r.findAllIn(p4).size >= 3, "all dims broadcast")
    assert(!p4.contains("CartesianProduct"))
  }

  test("q06: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q06Topk(t))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q22: snapshot diff is a single join, no cartesian, no extra exchange") {
    val p = plan(ReverseEtl.q22SnapshotDiff(t))
    assert(!p.contains("CartesianProduct"))
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).size == 1,
      "exactly one join for the diff")
  }

  test("q30/q31: dedup plans contain no UDFs — everything codegen-able") {
    assert(!plan(TrainingData.q30DedupExact(t)).contains("BatchEvalPython"))
    val p = plan(TrainingData.q31DedupMinhash(t))
    assert(!p.toLowerCase.contains("scalaudf"), "minhash must be built-in expressions only")
  }

  test("q34: brute-force ANN broadcasts the query side") {
    val p = plan(TrainingData.q34AnnBrute(t))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), "corpus must never shuffle into a cartesian")
  }

  test("q34/q35: pair scoring uses the native dot_product kernel, not HOF lambdas") {
    assert(plan(TrainingData.q34AnnBrute(t)).contains("dot_product"))
    val p35 = plan(TrainingData.q35AnnLsh(t))
    assert(p35.contains("dot_product"), p35)
    assert(!p35.contains("lambdafunction"), "no interpreted higher-order fns in the ANN path")
  }

  test("q31/q32: signatures are per-row kernels — no signature shuffle at all") {
    val p = plan(TrainingData.q31DedupMinhash(t))
    assert(p.contains("ngram_hashes"), p)
    assert(p.contains("minhash_signature"), "signature must be the per-row kernel")
    assert(!p.contains("collect_set"), "shingle sets must never travel through a shuffle")
    val p32 = plan(TrainingData.q32DedupSimhash(t))
    assert(p32.contains("simhash64"), "simhash must be the per-row kernel")
  }

  test("q40/q54: fingerprint fold is the native rolling_hash kernel, not a HOF") {
    Seq(TrainingData.q40Fingerprint(t), TrainingData.q54FingerprintPortable(t)).foreach { df =>
      val p = plan(df)
      assert(p.contains("rolling_hash"), p)
      assert(!p.contains("lambdafunction"), "interpreted HOF fold in the fingerprint hot loop")
    }
  }

  test("q41: hash split is pure per-row arithmetic — zero exchanges before the sort") {
    val p = plan(TrainingData.q41Split(t))
    // the only exchange allowed is the final presentation ORDER BY
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("Join"), "split must not join or shuffle data")
  }

  test("q43: tfidf broadcasts the corpus-size scalar, never a cartesian") {
    val p = plan(TrainingData.q43Tfidf(t))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q20: the cursor predicate reaches the parquet scan (PushedFilters)") {
    val p = plan(ReverseEtl.q20CursorIncremental(t))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThan(o_orderdate"), p)
  }

  test("q46: sketch rollup keeps partial aggregation on both levels") {
    val p = plan(TrainingData.q46ApproxDistinct(t))
    assert(p.contains("partial_hll_sketch_agg"), "sketch build must combine map-side")
    assert(p.contains("partial_hll_union_agg"), "sketch union must combine map-side")
    assert(p.contains("BroadcastHashJoin"), "customer dim must broadcast")
  }

  test("q55: the composed prep pipeline reads the corpus EXACTLY once") {
    val p = plan(TrainingData.q55TrainingPipeline(t))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"pipeline must be single-scan (join formulation re-reads the corpus):\n$p")
  }

  test("payload batchers: every window is partitioned — no single-task global sort") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.window.WindowExec
    def unpartitioned(df: DataFrame): Seq[String] = {
      val p = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName }
    }
    val emails = t.customer.select(col("c_name").as("email"))
    val shaped = Seq(
      "audienceBatches" -> graft.sinks.Payloads.audienceBatches(emails, "email"),
      "httpBodies" -> graft.sinks.Payloads.httpBodies(
        t.customer.select("c_custkey", "c_name"), "ndjson", 100, orderCol = "c_custkey"),
      "q27Batcher" -> ReverseEtl.q27Batcher(t))
    val bad = shaped.collect { case (n, df) if unpartitioned(df).nonEmpty => n }
    assert(bad.isEmpty, s"unpartitioned WindowExec (global sort bottleneck) in: $bad")
  }

  test("q66: the bloom prefilter sits on the fact side BEFORE the join") {
    val p = plan(ReverseEtl.q66BloomPrefilter(t))
    assert(p.contains("might_contain"), s"bloom membership probe missing:\n$p")
    // the probe must be a Filter above the orders scan, not after the join:
    // in plan text the Filter(might_contain) appears deeper than the join node
    val joinIdx = p.indexOf("Join")
    val probeIdx = p.indexOf("might_contain")
    assert(joinIdx >= 0 && probeIdx > joinIdx,
      "prefilter must be below (deeper than) the semi join in the plan tree")
  }

  test("q65: top-k sketch build and merge keep partial aggregation") {
    val p = plan(TrainingData.q65TopkSketch(t))
    assert(p.contains("partial_"), s"sketch aggs must combine map-side:\n$p")
  }

  test("q68: reservoir windows are lane-salted — no stratum-wide first-pass sort") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = TrainingData.q68ReservoirSample(t)
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    // phase 1 partitions by (stratum, lane); phase 2 by stratum over the
    // bounded (<= salts*k per stratum) survivors
    assert(windows.nonEmpty && windows.max == 2,
      s"expected a (stratum, lane) salted first window, got partition arities $windows")
    assert(windows.forall(_ >= 1), "no unpartitioned window anywhere")
  }

  test("q79: full outer of two same-key aggregates — no broadcast, one co-partitioned join") {
    val p = plan(Relational.q79FullOuter(t))
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("BroadcastHashJoin"), "full outer must not broadcast (both sides keep unmatched rows)")
  }

  test("q80: the gap-fill window runs over the spine, partitioned by series") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = Relational.q80GapFill(t).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"LOCF window must be partitioned (got arities $windows)")
  }

  test("q83: chunking is closed-form — no interpreted HOF anywhere in the plan") {
    val p = plan(TrainingData.q83Chunking(t))
    assert(!p.contains("lambdafunction"),
      "chunk-start pruning must be the closed-form count, not a filter() HOF")
    assert(p.contains("Generate"), "chunks must come from a generator (explode), not a join")
  }

  test("q84: packing's only unpartitioned window is the tiny block rollup") {
    import org.apache.spark.sql.execution.window.WindowExec
    val exec = TrainingData.q84Packing(t).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    assert(windows.count(_ == 0) == 1,
      s"exactly one unpartitioned window (the #blocks-row offset scan), got $windows")
    assert(windows.count(_ >= 1) == 1,
      s"the per-row cumulative sum must partition by block, got $windows")
    val p = plan(TrainingData.q84Packing(t))
    assert(p.contains("BroadcastHashJoin"), "block offsets must broadcast back, never shuffle the docs")
  }

  test("q93/q98: line-dedup rebuild is struct-sort + field projection, never a lambda") {
    Seq(TrainingData.q93LineDedup(t), TrainingData.q98LineDedupIntra(t)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("lambdafunction"),
        "ordered reassembly must use sort_array + GetArrayStructFields, not transform()")
    }
  }

  test("q88: the histogram prefilter sits BEFORE the Levenshtein verify") {
    val p = plan(TrainingData.q88EditNeardup(t))
    assert(p.contains("l1_distance"), "L1 histogram prune must be in the plan")
    val l1 = p.indexOf("l1_distance")
    val lev = p.indexOf("levenshtein")
    assert(lev >= 0 && l1 >= 0, "both kernels present")
  }

  test("q110: dataset card reads the corpus EXACTLY once (shared pre-aggregate exchange)") {
    val p = plan(TrainingData.q110DatasetCard(t))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"stats and language-mix rollups must reuse one (source,lang,hash) exchange:\n$p")
  }

  test("q108: three distincts plan as ONE Expand, not three scans") {
    val p = plan(Relational.q108MultiDistinct(t))
    assert("Expand".r.findAllIn(p).size >= 1, p)
    assert("Scan parquet".r.findAllIn(p).size == 1, "one scan of orders")
    assert(p.contains("partial_"), "partial aggregation must survive the expand")
  }

  test("q107: kmeans update shuffles partial sums, not exploded rows") {
    val p = plan(TrainingData.q107KmeansStep(t))
    assert(p.contains("partial_count") || p.contains("partial_"), p)
    assert(!p.contains("Window"), "no window in the assignment path")
  }

  test("q112: correlation runs as ONE partial-aggregated scan") {
    val p = plan(Relational.q112Correlation(t))
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_"), "power sums must combine map-side")
  }

  test("q105: SCD2 apply is one co-keyed join plus a generator — no self-union re-scan") {
    val p = plan(ReverseEtl.q105Scd2(t))
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).size == 1,
      s"exactly one open-generation/snapshot join:\n$p")
    assert(p.contains("Generate explode"), "versions must expand through one generator")
  }

  test("q120: the anomaly window is partitioned by event_type (bounded day frame)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val phys = Events.q120AnomalyFlags(t).queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val unpartitioned = phys.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
    assert(unpartitioned.isEmpty, "no unpartitioned window in the anomaly plan")
  }

  test("q145: prototype/offset frames broadcast; rank windows partition by (label, bucket)") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = TrainingData.q145PrototypePrune(t)
    val p = plan(df)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "centroid and offset frames must both broadcast into the corpus side")
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    // corpus-side local rank partitions by (label, bucket); the offset
    // cumulation partitions by label over the labels×buckets tiny frame
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"no unpartitioned window on any 100 TB-side frame (got $windows)")
  }

  test("q148: the only unpartitioned pieces ride tiny frames — local ranks partition by range") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Relational.q148EquiDepth(t)
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    // exactly one partitioned window touches corpus rows (the per-range
    // row_number); the unpartitioned one cumulates the ~160-row range
    // totals frame
    assert(windows.count(_ >= 1) == 1 && windows.count(_ == 0) == 1,
      s"expected one per-range corpus window + one tiny-frame cumulation, got $windows")
    assert(plan(df).contains("BroadcastHashJoin"), "range offsets must broadcast back")
  }

  test("q144: CDC chunk assignment windows partition by doc — no corpus-wide sort") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = TrainingData.q144CdcChunking(t)
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"every CDC window must partition by document (got arities $windows)")
  }

  test("q168: trend regression is partial-aggregated with no window") {
    val p = plan(Relational.q168TrendRegression(t))
    assert(p.contains("partial_"), "power sums must combine map-side")
    assert(!p.contains("Window"), "no window — the fit is pure aggregation")
  }

  test("q172: attribution joins nothing — as-of is the union+window pass") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = ReverseEtl.q172Attribution(t)
    val p = plan(df)
    assert(!"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r.findAllIn(p).hasNext,
      s"no touch×conversion join of any kind:\n$p")
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other => other
    }
    val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
    assert(windows.nonEmpty && windows.forall(_ >= 1),
      s"every attribution window must be partitioned (user / conversion), got $windows")
  }

  test("q167/q173: the daily-frame windows are partitioned by series") {
    import org.apache.spark.sql.execution.window.WindowExec
    Seq(Relational.q167InterpFill(t), Relational.q173TimeWeightedAvg(t)).foreach { df =>
      val exec = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      val windows = exec.collect { case w: WindowExec => w.partitionSpec.length }
      assert(windows.nonEmpty && windows.forall(_ >= 1),
        s"series windows must partition by event_type, got $windows")
    }
  }

  test("q234/q235/q237: the drift/collocation/WOE family is window-free (pure partial-agg scans)") {
    import org.apache.spark.sql.execution.window.WindowExec
    for ((name, df) <- Seq(
        "q234" -> TrainingData.q234Psi(t),
        "q235" -> TrainingData.q235CoocLift(t),
        "q237" -> TrainingData.q237WoeIv(t))) {
      val exec = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      val wins = exec.collect { case w: WindowExec => w }
      assert(wins.isEmpty, s"$name must carry no window at all: ${wins.map(_.nodeName)}")
    }
  }

  // ONE construction pass over the whole catalog, shared by every
  // catalog-wide gate below. Constructing a query is not free here: the
  // iterative family (components/MSF/Louvain/PageRank…) runs its rounds'
  // jobs during construction, so each extra catalog sweep costs ~6 min of
  // suite wall time — r12's two independent sweeps made PlanSpec alone
  // 727 s of the 1819 s run the driver's budget killed.
  private lazy val catalogPlans: Seq[(String, SparkPlan)] =
    graft.queries.Catalog.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val exec = fn(spark, sfDir).queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.initialPlan
        case other => other
      }
      name -> exec
    }

  test("EVERY catalog query: no cartesian product, no UDFs, anywhere") {
    val offenders = catalogPlans.flatMap {
      case (name, exec) =>
        val p = exec.toString
        val bad = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "ScalaUDF"         -> p.toLowerCase.contains("scalaudf"),
          "BatchEvalPython"  -> p.contains("BatchEvalPython")
        ).collect { case (what, true) => what }
        if (bad.isEmpty) Nil else Seq(s"$name: ${bad.mkString(",")}")
    }
    assert(offenders.isEmpty, s"plan invariants violated:\n${offenders.mkString("\n")}")
  }

  test("EVERY catalog query: unpartitioned windows only on the documented bounded frames") {
    // the r10 verdict's stretch gate: an unpartitioned WindowExec funnels
    // its whole input through ONE task, so it is only ever acceptable on
    // a frame BOUNDED by something other than corpus size. Every such
    // window in the catalog must be on this list with its bound; a new
    // query that sneaks in a corpus-scale global sort fails here, and a
    // stale entry (query fixed, whitelist not updated) fails too, so the
    // list stays exactly the documented set.
    // Two recurring shapes, both bounded BY CONSTRUCTION:
    //  (a) two-level templates (Ranking/Sweep/selectUntilBudget) cumulate
    //      BUCKET OFFSETS over a one-row-per-bucket frame — Catalyst
    //      folds the lit(1) partition away, so the exec node reports an
    //      empty partitionSpec, but the frame is bucket-count-sized;
    //  (b) direct windows over aggregated DISTINCT-VALUE frames (event
    //      times, quantized scores, contingency cells), bounded by the
    //      signal's domain, never corpus row count.
    val bounded: Map[String, String] = Map(
      // (a) bucket-offsets frames of the two-level templates
      "q102_budget_select"   -> "priority-bucket offsets (selectUntilBudget)",
      "q123_curation_report" -> "inherits q102's bucket offsets (composition)",
      "q125_shard_layout"    -> "shard-bucket offsets (two-level rank)",
      // q157_lm_terciles / q224_rfm left the list in r12: groupRankDesc's
      // bucketed-frame persist removed their unpartitioned window
      "q158_concurrency"     -> "per-day bucket offsets (Sweep.runningSum)",
      // (b) bounded distinct-value / small aggregate frames
      "q84_packing"          -> "block rollup frame (docs div blockTokens rows)",
      "q116_coverage_curve"  -> "distinct-frequency profile, <= sqrt(2N) rows",
      "q184_compaction_plan" -> "file-stats frame (one row per file)",
      "q17_cte"              -> "monthly revenue frame (one row per month)",
      "q100_filter_funnel"   -> "one row per funnel rule",
      "q141_budget_waterfill" -> "domain frame (one row per source domain)",
      "q142_mixture_schedule" -> "domain x schedule-step frame",
      "q148_equi_depth"      -> "distinct quantized-value frame (q148 doc)",
      "q161_zipf_profile"    -> "distinct-frequency frame, <= sqrt(2N) rows",
      "q179_ks_drift"        -> "distinct-value frame, loud-fail guarded by maxDistinctValues",
      "q194_t_closeness"     -> "per-class distinct sensitive-value frame",
      "q197_seasonal_anomalies" -> "per-day series frame (one row per day)",
      "q221_chi_square"      -> "contingency-cell frame (category product)",
      "q223_pareto_front"    -> "distinct-x frame (two-level skyline kernel)",
      "q228_roc_auc"         -> "distinct-score frame (Mann-Whitney ranks)",
      "q229_survival"        -> "distinct event-time frame (Kaplan-Meier steps)"
    )
    val got = catalogPlans.flatMap {
      case (name, exec) =>
        val n = exec.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
        }.size
        if (n == 0) Nil else Seq(name)
    }.toSet
    val undocumented = got -- bounded.keySet
    val stale = bounded.keySet -- got
    assert(undocumented.isEmpty,
      s"UNDOCUMENTED unpartitioned windows (corpus-scale single-task risk): $undocumented")
    assert(stale.isEmpty,
      s"stale whitelist entries (fixed queries still listed): $stale")
  }
}
