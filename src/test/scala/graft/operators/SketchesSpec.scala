package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** HLL sketch laws: rolled-up (merged) estimates agree with one-shot
  * estimates over the same data within a tight bound — NOT equality: a
  * DataSketches union re-feeding all-sparse inputs keeps the HIP
  * estimator, one touching a dense sketch reads out through the composite
  * estimator, so estimator paths (and hence digits) can differ once any
  * group leaves coupon mode (q60 documents the same law at the gate) —
  * and both sit within HLL's error envelope of the exact distinct count. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
      (col("o_orderkey") % 4).as("g"))

  test("sketch rollup (union of partials) agrees with the one-shot sketch estimate") {
    val perYear = Sketches.distinctSketches(orders, Seq("g", "yr"), "o_custkey")
    val rolled = Sketches.rollupEstimate(perYear, Seq("g"))
      .as[(Long, Long)].collect().toMap
    // a second, unrelated split of the same value set — rollup topology
    // must not matter (within the estimator-path bound)
    val perBucket = Sketches.distinctSketches(
      orders.withColumn("b", pmod(xxhash64(col("o_custkey")), lit(8L))),
      Seq("g", "b"), "o_custkey")
    val rolled2 = Sketches.rollupEstimate(perBucket, Seq("g"))
      .as[(Long, Long)].collect().toMap
    val oneShot = orders.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))).as("e"))
      .as[(Long, Long)].collect().toMap
    assert(rolled.keySet == oneShot.keySet && rolled.keySet == rolled2.keySet)
    rolled.foreach { case (g, e) =>
      assert(math.abs(e - oneShot(g)).toDouble / math.max(e, oneShot(g)).max(1L) <= 0.02,
        s"g=$g rolled=$e oneShot=${oneShot(g)} beyond the 2% estimator-path bound")
      assert(math.abs(e - rolled2(g)).toDouble / math.max(e, rolled2(g)).max(1L) <= 0.02,
        s"g=$g year-rollup=$e bucket-rollup=${rolled2(g)} beyond the 2% bound")
    }
  }

  test("estimates are within 5% of exact distinct counts") {
    val exact = orders.groupBy("g").agg(countDistinct(col("o_custkey")).as("n"))
      .as[(Long, Long)].collect().toMap
    val est = Sketches.rollupEstimate(
      Sketches.distinctSketches(orders, Seq("g", "yr"), "o_custkey"), Seq("g"))
      .as[(Long, Long)].collect().toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.05, s"g=$g exact=$n est=${est(g)}")
    }
  }

  private lazy val prices = spark.read.parquet(s"$sfDir/orders.parquet")
    .select(col("o_orderstatus"), year(col("o_orderdate")).as("yr"), col("o_totalprice"))

  test("quantile sketches: build → merge rollup stays within 2ε rank bounds of exact") {
    val eps = 0.01
    val perYear = Sketches.quantileSketches(prices, Seq("o_orderstatus", "yr"),
      "o_totalprice", relativeError = eps)
    // sketches survive a write/read roundtrip (the persist-then-merge path)
    val dir = java.nio.file.Files.createTempDirectory("graft-qsketch").toString
    perYear.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val rolled = Sketches.rollupQuantiles(reloaded, Seq("o_orderstatus"), Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val bounds = prices.groupBy("o_orderstatus")
      .agg(expr(s"percentile(o_totalprice, array(${0.5 - 2 * eps}D, ${0.5 + 2 * eps}D, " +
                s"${0.9 - 2 * eps}D, ${0.9 + 2 * eps}D))").as("b"))
      .as[(String, Seq[Double])].collect().toMap
    bounds.foreach { case (st, b) =>
      val (p50, p90) = rolled(st)
      assert(p50 >= b(0) && p50 <= b(1), s"$st p50=$p50 outside [${b(0)}, ${b(1)}]")
      assert(p90 >= b(2) && p90 <= b(3), s"$st p90=$p90 outside [${b(2)}, ${b(3)}]")
    }
  }

  test("top-k sketches: build → persist → merge rollup is exact under capacity") {
    val perYear = Sketches.topKSketches(orders, Seq("yr"), "o_custkey")
    // survive the write/read roundtrip (the persist-then-merge path)
    val dir = java.nio.file.Files.createTempDirectory("graft-tksketch").toString
    perYear.write.mode("overwrite").parquet(dir)
    val rolled = Sketches.rollupTopK(spark.read.parquet(dir), Seq.empty, k = 100000)
      .as[(Long, Long)].collect().toMap
    val exact = orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(rolled == exact,
      "under the tracked-item budget the frequent-items sketch is exact, merge included")
  }

  test("top-k sketches: k truncates to the k most frequent items") {
    val perYear = Sketches.topKSketches(orders, Seq("yr"), "o_custkey")
    val top10 = Sketches.rollupTopK(perYear, Seq.empty, k = 10)
      .as[(Long, Long)].collect()
    assert(top10.length == 10)
    val exactTop = orders.groupBy("o_custkey").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().sortBy(-_._2)
    // every returned count must be in the exact top tier (ties make the
    // item set ambiguous at the boundary, counts are not)
    val floor = exactTop(9)._2
    assert(top10.forall(_._2 >= floor), s"top-10 must all count >= $floor")
  }

  test("quantile sketch query on an empty sketch is null, not a crash") {
    val empty = prices.filter(lit(false))
    val sk = Sketches.quantileSketches(empty.select(lit("g").as("g"), col("o_totalprice"))
      .unionByName(Seq(("g", Option.empty[Double])).toDF("g", "o_totalprice")),
      Seq("g"), "o_totalprice")
    val out = Sketches.rollupQuantiles(sk, Seq("g"), Seq(0.5))
      .as[(String, Option[Double])].collect()
    assert(out.length == 1 && out.head._2.isEmpty)
  }

  private lazy val priorities = spark.read.parquet(s"$sfDir/orders.parquet")
    .select((col("o_orderkey") % 3).as("g"), year(col("o_orderdate")).as("yr"),
      col("o_orderpriority").as("item"))

  test("count-min rollup grid equals the one-shot grid: identical estimates") {
    import graft.functions.CountMinFunctions._
    val rolled = Sketches.rollupFreq(
      Sketches.freqSketches(priorities, Seq("g", "yr"), "item"), Seq("g"))
    val oneShot = Sketches.freqSketches(priorities, Seq("g"), "item")
      .withColumnRenamed("cms", "cms1")
    val items = priorities.select("g", "item").distinct()
    val both = items.join(rolled, "g").join(oneShot, "g")
      .select(col("g"), col("item"),
        countMinEstimate(col("cms"), col("item")).as("e_roll"),
        countMinEstimate(col("cms1"), col("item")).as("e_one"))
      .as[(Long, String, Long, Long)].collect()
    assert(both.nonEmpty && both.forall(r => r._3 == r._4),
      s"rollup and one-shot estimates must be identical, got ${both.take(5).toSeq}")
  }

  test("count-min never underestimates; exact at this width; unseen item is 0") {
    import graft.functions.CountMinFunctions._
    val exact = priorities.groupBy("g", "item").agg(count(lit(1)).as("n"))
    val sk = Sketches.freqSketches(priorities, Seq("g"), "item")
    val est = exact.join(sk, "g")
      .select(col("g"), col("item"), col("n"),
        countMinEstimate(col("cms"), col("item")).as("e"))
      .as[(Long, String, Long, Long)].collect()
    assert(est.nonEmpty && est.forall(r => r._4 >= r._3), "CMS must never underestimate")
    assert(est.forall(r => r._4 == r._3), "width 2048 over 5 items: no collisions")
    val unseen = sk.select(countMinEstimate(col("cms"), lit("NOT-AN-ITEM")).as("e"))
      .as[Long].collect()
    assert(unseen.forall(_ == 0L), "an item hashed to untouched counters reads 0")
  }

  test("count-min merge of an empty group set yields null sketch, not a crash") {
    import graft.functions.CountMinFunctions._
    val empty = priorities.filter(lit(false))
    val merged = Sketches.rollupFreq(
      Sketches.freqSketches(empty, Seq("g"), "item")
        .unionByName(Seq((99L, Option.empty[Array[Byte]])).toDF("g", "cms")),
      Seq("g"))
    val out = merged.select(col("g"), col("cms").isNull.as("isnull"))
      .as[(Long, Boolean)].collect()
    assert(out.length == 1 && out.head._2, "all-null input sketches merge to null")
  }

  // ---- C127: KMV bottom-k sketches ----

  private lazy val kmvFixture = {
    // three slices with controlled overlap: A = 0..999, B = 500..1499
    // (|A∩B| = 500, J = 1/3), C = tiny (< k, exact path)
    val a = (0 until 1000).map(i => ("A", s"v$i"))
    val b = (500 until 1500).map(i => ("B", s"v$i"))
    val c = (0 until 40).map(i => ("C", s"v$i"))
    (a ++ b ++ c).toDF("slice", "v")
  }

  test("C127: below-k slices estimate exactly; k bounds every sketch") {
    val sk = Sketches.kmvSketches(kmvFixture, "slice", "v", k = 256)
    val ests = sk.select("slice", "n_kept", "est").distinct()
      .as[(String, Long, Long)].collect().map { case (s, n, e) => s -> ((n, e)) }.toMap
    assert(ests("C") == ((40L, 40L)), "below-k slice must be exact")
    assert(ests("A")._1 == 256L && ests("B")._1 == 256L)
    // deterministic hash ⇒ deterministic estimate; KMV rel-err ~ 1/sqrt(k)
    for (s <- Seq("A", "B"))
      assert(math.abs(ests(s)._2 - 1000L) <= 200L, s"$s est=${ests(s)._2} off true 1000")
    val counts = sk.groupBy("slice").count().as[(String, Long)].collect().toMap
    assert(counts.values.forall(_ <= 256L))
  }

  test("C127: merged-pair union estimate EQUALS the sketch of the true union") {
    // bottom-k of (bottom-k(A) ∪ bottom-k(B)) = bottom-k(A ∪ B) — the
    // closure property the pair estimator relies on; pin it exactly.
    val sk = Sketches.kmvSketches(kmvFixture, "slice", "v", k = 256)
    val pairs = Sketches.kmvPairs(sk, k = 256)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val abDirect = Sketches.kmvSketches(
        kmvFixture.filter(col("slice").isin("A", "B")).withColumn("slice", lit("AB")),
        "slice", "v", k = 256)
      .select("slice", "est").distinct().as[(String, Long)].collect().head._2
    assert(pairs(("A", "B"))._5 == abDirect,
      s"pair union est ${pairs(("A", "B"))._5} != direct union sketch $abDirect")
    // A∪C has 1000 distinct (C ⊂ A): union est must equal A's own est
    val aEst = Sketches.kmvSketches(kmvFixture.filter(col("slice") === "A"), "slice", "v", k = 256)
      .select("est").distinct().as[Long].collect().head
    assert(pairs(("A", "C"))._5 == aEst, "C ⊂ A: union sketch must equal A's sketch")
  }

  test("C127: Jaccard/intersection estimates track truth; exact when union < k") {
    val sk = Sketches.kmvSketches(kmvFixture, "slice", "v", k = 256)
    val pairs = Sketches.kmvPairs(sk, k = 256)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // A vs B: true J = 500/1500 = 333333 ppm; 256-sample binomial ⇒ generous box
    val ab = pairs(("A", "B"))
    assert(math.abs(ab._7 - 333333L) <= 120000L, s"jacc_ppm=${ab._7} far from 1/3")
    assert(math.abs(ab._8 - 500L) <= 220L, s"inter_est=${ab._8} far from 500")
    // disjoint-by-construction check: B vs C share v500..? C = v0..v39 ⊂ A,
    // disjoint from B (v500+) ⇒ matches = 0 exactly
    val bc = pairs(("B", "C"))
    assert(bc._6 == 0L && bc._7 == 0L && bc._8 == 0L, s"disjoint pair must read 0, got $bc")
  }

  test("C127: sketches are one-pass mergeable — re-sketching sketch rows is identity") {
    // feeding the kept rows back through a bottom-k of the same k must
    // reproduce the sketch (idempotence a persisted-sketch store relies on)
    val sk = Sketches.kmvSketches(kmvFixture, "slice", "v", k = 256)
    val rows = sk.select("slice", "hu").withColumn("rk2",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("slice")
          .orderBy(col("hu").asc)))
    val orig = sk.select("slice", "rk", "hu").as[(String, Long, java.math.BigDecimal)]
      .collect().map(r => (r._1, r._2, r._3.toBigInteger)).toSet
    val again = rows.select(col("slice"), col("rk2").cast("long"), col("hu"))
      .as[(String, Long, java.math.BigDecimal)]
      .collect().map(r => (r._1, r._2, r._3.toBigInteger)).toSet
    assert(orig == again)
  }
}
