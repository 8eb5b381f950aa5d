package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C21/C22 — deterministic sampling: stratified Bernoulli fractions and
  * the two-phase fixed-size per-stratum selection. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("stratifiedSample: deterministic, per-stratum fractions within tolerance") {
    val fr = Map("F" -> 0.10, "O" -> 0.05, "P" -> 0.50)
    val s1 = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", fr)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    val s2 = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", fr)
      .select("o_orderkey").as[Long].collect().sorted.toSeq
    assert(s1 == s2, "same input, same sample — no RNG state")

    val totals = orders.groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    val sampled = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey", fr)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    fr.foreach { case (st, f) =>
      val n = totals(st); val k = sampled.getOrElse(st, 0L)
      // md5 buckets are uniform: expect f*n ± 5 sigma of Bernoulli noise
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(k - f * n) <= 5 * sigma + 1,
        s"$st: sampled $k of $n at fraction $f (expected ~${(f * n).round})")
    }
  }

  test("stratifiedSample: strata without a fraction are dropped") {
    val only = Sampling.stratifiedSample(orders, "o_orderstatus", "o_orderkey",
      Map("F" -> 1.0))
    assert(only.select("o_orderstatus").distinct().as[String].collect().toSeq == Seq("F"))
    assert(only.count() ==
      orders.filter(col("o_orderstatus") === "F").count(), "fraction 1.0 keeps every row")
  }

  test("reservoirPerStratum: two-phase selection equals the one-phase top-k") {
    val k = 37
    val got = Sampling.reservoirPerStratum(orders, "o_orderstatus", "o_orderkey", k)
      .select("o_orderstatus", "o_orderkey", "sample_rank")
      .as[(String, Long, Long)].collect().toSet
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(Sampling.rankHash(col("o_orderkey")).asc, col("o_orderkey").asc)
    val want = orders
      .withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= k)
      .select("o_orderstatus", "o_orderkey", "sample_rank")
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, "salted two-phase top-k must equal the global ranking")
  }

  test("reservoirPerStratum: exactly k rows per stratum (when the stratum has k)") {
    val k = 25
    val counts = Sampling.reservoirPerStratum(orders, "o_orderstatus", "o_orderkey", k)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    val totals = orders.groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    totals.foreach { case (st, n) =>
      assert(counts(st) == math.min(k.toLong, n), s"$st: ${counts(st)} of expected ${math.min(k.toLong, n)}")
    }
  }
  test("prioritySample: two-phase selection equals the one-phase ranking, with τ and HT weights") {
    val k = 9
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("w", col("n_chars").cast("long") + lit(1L))
    val got = Sampling.prioritySample(docs, "lang", "doc_id", "w", k)
    val rows = got.select("lang", "doc_id", "weight", "sample_rank", "ht_weight")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    // one-phase spec: rank by q = w / (u / 2^60) DESC, id ASC per stratum
    val u = Sampling.rankHash(col("doc_id")) + lit(1L)
    val q = col("w").cast("double") / (u.cast("double") / lit(math.pow(2.0, 60)))
    val wG = Window.partitionBy("lang").orderBy(q.desc, col("doc_id").asc)
    val ranked = docs.withColumn("q", q)
      .withColumn("rn", row_number().over(wG).cast("long"))
    val tau = ranked.filter(col("rn") === k + 1)
      .select(col("lang"), col("q").as("tau"))
    val want = ranked.filter(col("rn") <= k)
      .join(tau, Seq("lang"), "left_outer")
      .select(col("lang"), col("doc_id"), col("w"), col("rn"),
        greatest(col("w").cast("double"), coalesce(col("tau"), lit(0.0))))
      .as[(String, Long, Long, Long, Double)].collect().toSet
    assert(rows == want, "salted two-phase priority top-k must equal the global ranking")
    // every sampled row's priority is >= its stratum's τ, so HT clamping
    // can only RAISE a weight: ŵ >= w, and ŵ = w wherever w >= τ
    assert(rows.forall { case (_, _, w, _, ht) => ht >= w.toDouble })
  }

  test("prioritySample: strata smaller than k keep all rows with ŵ = w") {
    val docs = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 5L))
      .toDF("doc_id", "lang", "w")
    val out = Sampling.prioritySample(docs, "lang", "doc_id", "w", k = 5)
      .select("lang", "doc_id", "weight", "tau", "ht_weight")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), r.getDouble(4)))
    assert(out.length == 3, "no stratum reaches k+1 rows: everything kept")
    assert(out.forall(_._4.isEmpty), "τ undefined below k+1 rows")
    assert(out.forall { case (_, _, w, _, ht) => ht == w.toDouble },
      "without a threshold the HT weight is the exact weight")
  }

  test("prioritySample: weighted selection prefers heavy rows") {
    // one stratum, 200 rows: ids 0..189 weight 1, ids 190..199 weight 10^9.
    // With priorities w/u, the 10 heavy rows all but surely outrank the
    // light ones (P[heavy loses to a light row] ~ 1e-9 per pair).
    val docs = (0L until 200L).map(i => (i, "s", if (i >= 190) 1000000000L else 1L))
      .toDF("doc_id", "lang", "w")
    val kept = Sampling.prioritySample(docs, "lang", "doc_id", "w", k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert((190L until 200L).toSet.subsetOf(kept),
      s"the heavy rows must dominate the sample, got $kept")
  }

  test("mixtureSample: hits target shares by downsampling only, deterministically") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val weights = Map("src0" -> 4, "src1" -> 2)
    val out = Sampling.mixtureSample(docs, "source", "doc_id", weights)
    val got = out.groupBy("source").count().as[(String, Long)].collect().toMap
    val before = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    // never upsamples
    got.foreach { case (src, n) => assert(n <= before(src), s"$src upsampled: $n > ${before(src)}") }
    // the max-weight source keeps ~everything (it binds the cap), and the
    // realized shares order like the weights: src0 > src1 > default
    assert(got("src0") == before("src0"), "the binding source keeps all rows")
    assert(got("src0") > got("src1") && got("src1") > got.getOrElse("src2", 0L),
      s"shares must order like weights, got $got")
    // determinism
    val again = Sampling.mixtureSample(docs, "source", "doc_id", weights)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == got)
  }

  test("temperatureMixture: flattens a skewed axis — head downsampled, tail kept") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Sampling.temperatureMixture(docs, "lang", "doc_id")
    val got = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    // never upsamples; the dominant language loses share
    got.foreach { case (l, n) => assert(n <= before(l), s"$l upsampled") }
    val head = before.maxBy(_._2)._1
    val headShareBefore = before(head).toDouble / before.values.sum
    val headShareAfter = got(head).toDouble / got.values.sum
    assert(headShareAfter < headShareBefore,
      s"head '$head' share must shrink: $headShareBefore -> $headShareAfter")
    // at least one tail language keeps every row (the cap binds there)
    assert(before.keys.exists(l => got.getOrElse(l, 0L) == before(l)))
  }

  test("mixtureSample: NULL-source rows form a stratum at defaultWeight, not a silent drop") {
    // two named sources plus rows whose source is NULL; the NULL stratum
    // must be sampled at defaultWeight like any unlisted source — before the
    // null-safe join those rows shrank every cap but vanished from the output
    val docs = (1L to 300L).map { i =>
      val src = (i % 3) match { case 0 => null; case 1 => "a"; case 2 => "b" }
      (i, src)
    }.toDF("doc_id", "source")
    val out = Sampling.mixtureSample(docs, "source", "doc_id", Map("a" -> 2, "b" -> 2))
    val got = out.groupBy("source").count()
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(got.contains(None), s"NULL-source stratum missing from output: $got")
    // weights 2:2:1 over equal-size strata: NULL keeps ~half of what a or b keep
    val nullKept = got(None).toDouble
    val namedKept = (got(Some("a")) + got(Some("b"))).toDouble / 2
    assert(nullKept <= namedKept, s"NULL stratum over-sampled: $got")
    assert(nullKept > namedKept * 0.25, s"NULL stratum under-sampled: $got")
    // and accounting is closed: every output row existed in the input
    assert(out.count() == out.join(docs, Seq("doc_id"), "left_semi").count())
  }

  test("capPerGroup: under-cap groups pass through whole; over-cap groups keep exactly cap") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cap = 7
    val kept = Sampling.capPerGroup(docs, "source", "doc_id", cap)
    val before = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val after = kept.groupBy("source").count().as[(String, Long)].collect().toMap
    before.foreach { case (src, n) =>
      assert(after.getOrElse(src, 0L) == math.min(cap.toLong, n),
        s"$src: kept ${after.getOrElse(src, 0L)} of $n at cap $cap")
    }
    // deterministic and a subset of the input
    val again = Sampling.capPerGroup(docs, "source", "doc_id", cap)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == kept.select("doc_id").as[Long].collect().sorted.toSeq)
    assert(kept.join(docs, Seq("doc_id"), "left_anti").count() == 0)
  }

  test("selectUntilBudget: two-level bucketed scan equals the one-phase global window") {
    import org.apache.spark.sql.expressions.Window
    val rows = (0L until 200L).map(i => (i, (i * 37) % 500, 10L + i % 7))
    val df = rows.toDF("id", "prio", "w")
    val got = Sampling.selectUntilBudget(df, "prio", "w", "id",
        budget = 600L, granularity = 64L)
      .select("id").as[Long].collect().toSet
    // one-phase spec: global prefix-exclusive over (prio DESC, id ASC)
    val wG = Window.orderBy(col("prio").desc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("pe", sum(col("w")).over(wG) - col("w"))
      .filter(col("pe") < 600L).select("id").as[Long].collect().toSet
    assert(got == expected, s"diff: ${got.diff(expected)} / ${expected.diff(got)}")
    assert(got.nonEmpty && got.size < 200, "budget must bind")
  }

  test("selectUntilBudget: the budget-crossing row is kept, the next one is not") {
    val df = Seq((1L, 100L, 50L), (2L, 90L, 50L), (3L, 80L, 50L)).toDF("id", "prio", "w")
    // budget 60: row 1 (pe=0) kept, row 2 (pe=50) kept — it CROSSES the
    // budget — row 3 (pe=100) dropped
    val got = Sampling.selectUntilBudget(df, "prio", "w", "id", budget = 60L)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("leakageSafeSplit: clusters never straddle splits; singletons match hashSplit") {
    val docs = (0L until 100L).toDF("doc_id")
    // clusters: {0,1,2} and {10,11}; everything else singleton
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("doc_id", "cluster_id")
    val out = Sampling.leakageSafeSplit(docs, clusters)
      .select("doc_id", "cluster_id", "split").as[(Long, Long, String)].collect()
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(Set(byDoc(0L)._3, byDoc(1L)._3, byDoc(2L)._3).size == 1, "cluster {0,1,2} splits together")
    assert(byDoc(10L)._3 == byDoc(11L)._3, "cluster {10,11} splits together")
    // singletons: identical to the plain per-doc hash split
    val plain = Sampling.hashSplit(docs, "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val clustered = Set(0L, 1L, 2L, 10L, 11L)
    assert(out.filterNot(r => clustered(r._1)).forall(r => plain(r._1) == r._3),
      "non-clustered docs keep their hashSplit assignment")
    assert(out.length == 100)
  }

  test("budgetWaterfill: closed form matches iterative water-filling; allocation sums to budget") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = Sampling.budgetWaterfill(docs,
        capFactor = lit(1) + length(col("domain")) % 3)
      .orderBy("domain")
      .select("domain", "n_tokens", "cap", "saturated", "allocation")
      .as[(String, Long, Long, Boolean, Long)].collect().toSeq

    // independent reference: domain frame from first principles
    val doms = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("nt"))
      .groupBy("source").agg(sum("nt").as("n")).as[(String, Long)].collect()
      .map { case (s, n) => (s, n, n * (1 + s.length % 3)) }.sortBy(_._1).toSeq
    val budget = doms.map(_._2).sum * 2

    // iterative water-filling: repeatedly saturate any active domain whose
    // cap is below the current equal share (cap·|A| < R), exact integers
    var active = doms.map(d => d._1 -> d._3).toMap
    var r = budget
    var changed = true
    while (changed) {
      val over = active.filter { case (_, cap) => cap * active.size < r }
      changed = over.nonEmpty
      r -= over.values.sum
      active = active -- over.keys
    }
    val satRef = doms.map(_._1).toSet -- active.keys
    assert(got.map(g => g._1 -> g._4).toMap ==
      doms.map(d => d._1 -> satRef(d._1)).toMap,
      "saturation set must match the iterative fixed point")

    // saturated get cap; unsaturated get level (+1 for the first rem)
    val level = if (active.nonEmpty) r / active.size else 0L
    val rem = if (active.nonEmpty) r % active.size else 0L
    val unsatOrder = got.filterNot(_._4).map(_._1) // already domain-sorted
    val wantAlloc = got.map { g =>
      if (g._4) g._1 -> g._3
      else g._1 -> (level + (if (unsatOrder.indexOf(g._1) < rem) 1L else 0L))
    }.toMap
    assert(got.map(g => g._1 -> g._5).toMap == wantAlloc)
    assert(got.map(_._5).sum == budget, "water-filling must spend the budget exactly")
    assert(got.forall(g => g._5 <= g._3), "no allocation above its cap")
    // the closed form must actually exercise both branches on this corpus
    assert(got.exists(_._4) && got.exists(!_._4),
      "fixture must have both saturated and unsaturated domains")
  }

  test("mixtureSchedule: partial epoch is a hash-ordered prefix that just covers the remainder") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cap = lit(1) + length(col("domain")) % 3
    val plan = Sampling.budgetWaterfill(docs, capFactor = cap)
      .select("domain", "n_tokens", "allocation")
      .as[(String, Long, Long)].collect()
      .map(p => p._1 -> (p._2, p._3)).toMap
    val sched = Sampling.mixtureSchedule(docs, capFactor = cap)
      .withColumn("rh", Sampling.rankHash(col("doc_id")))
      .select("doc_id", "domain", "n_tokens", "epochs_full", "partial", "n_copies", "rh")
      .as[(Long, String, Long, Long, Boolean, Long, Long)].collect()

    sched.groupBy(_._2).foreach { case (dom, rows) =>
      val (domTok, alloc) = plan(dom)
      assert(rows.map(_._3).sum == domTok, s"$dom: token totals agree with the plan")
      val rem = alloc % domTok
      assert(rows.forall(_._4 == alloc / domTok), s"$dom: uniform full epochs")
      assert(rows.forall(r => r._6 == r._4 + (if (r._5) 1L else 0L)))
      val ordered = rows.sortBy(r => (r._7, r._1))
      // partial flags form a prefix in (hash, id) order
      val flags = ordered.map(_._5)
      assert(!flags.dropWhile(identity).contains(true), s"$dom: partial is a prefix")
      val partialTok = ordered.takeWhile(_._5).map(_._3)
      if (rem == 0) assert(partialTok.isEmpty, s"$dom: no partial epoch at rem=0")
      else {
        assert(partialTok.sum >= rem, s"$dom: partial prefix covers the remainder")
        assert(partialTok.dropRight(1).sum < rem,
          s"$dom: dropping the boundary doc undershoots — minimal prefix")
      }
    }
  }
}
