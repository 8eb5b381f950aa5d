package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** §2C ANN family: brute force against a hand-computed oracle, LSH against
  * brute force, near-dup detection of planted duplicates. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def naiveCos(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("brute-force top-k matches a driver-side naive oracle") {
    val queries = embeddings.filter(col("vec_id") < 3)
    val got = Similarity.bruteForceTopK(embeddings, queries, k = 5)
      .select("query_id", "neighbor_id", "cos_sim", "rank")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toSeq).toMap

    val all = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toMap
    for (q <- 0L to 2L) {
      val expected = all.filter(_._1 != q)
        .map { case (id, v) => (id, naiveCos(all(q), v)) }.toSeq
        .sortBy { case (id, c) => (-c, id) }.take(5)
      val actual = got(q)
      assert(actual.map(_._1) == expected.map(_._1), s"neighbor order for query $q")
      actual.zip(expected).foreach { case ((_, ca), (_, ce)) =>
        assert(math.abs(ca - ce) < 1e-9, s"cosine for query $q")
      }
    }
  }

  test("LSH ANN returns true cosines and only real neighbors") {
    val queries = embeddings.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(embeddings, queries, k = 499)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val lsh = Similarity.lshTopK(embeddings, queries, k = 10)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH must surface candidates on this corpus")
    lsh.foreach { case (q, n, c) =>
      assert(math.abs(c - brute((q, n))) < 1e-9, s"cosine for ($q,$n) must be exact")
    }
  }

  test("IVF ANN: exact cosines, single-cell membership, reasonable recall") {
    val queries = embeddings.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(embeddings, queries, k = 499)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.ivfTopK(embeddings, queries, k = 10, nlist = 16, nprobe = 8)
      .select("query_id", "neighbor_id", "cos_sim")
      .as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, n, c) =>
      assert(math.abs(c - brute((q, n))) < 1e-9, s"cosine for ($q,$n) must be exact")
    }
    // probing half the cells must recover a decent share of the true top-10
    val trueTop = brute.toSeq.groupBy(_._1._1).view.mapValues(
      _.sortBy { case ((_, n), c) => (-c, n) }.take(10).map(_._1._2).toSet).toMap
    val gotTop = ivf.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = gotTop.map { case (q, ns) => ns.intersect(trueTop(q)).size }.sum /
      (10.0 * gotTop.size)
    assert(recall >= 0.3, s"nprobe=8/16 recall too low: $recall")
  }

  test("IVF assignment is per-row math — no join/window/HOF on the corpus side") {
    val queries = embeddings.filter(col("vec_id") < 10)
    val p = Similarity.ivfTopK(embeddings, queries, k = 10).queryExecution
      .executedPlan.toString
    assert(p.contains("dot_product"), p)
    assert(!p.contains("lambdafunction"), "no interpreted HOFs in the IVF path")
  }

  test("quantized ANN: int8 scoring recalls the float top-k closely, exactly reproducibly") {
    val queries = embeddings.filter(col("vec_id") < 5)
    def ranked(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val qTop = ranked(Similarity.quantizedTopK(embeddings, queries, k = 10))
    val fTop = ranked(Similarity.bruteForceTopK(embeddings, queries, k = 10))
    // determinism: int8 scoring has no float-summation ordering noise
    val again = ranked(Similarity.quantizedTopK(embeddings, queries, k = 10))
    assert(qTop == again, "quantized ranking must be bit-stable")
    // recall of the float top-10 stays high at 64-dim int8
    val recall = fTop.keys.toSeq.map { q =>
      qTop(q).toSet.intersect(fTop(q).toSet).size.toDouble / 10.0
    }
    val mean = recall.sum / recall.size
    assert(mean >= 0.7, s"mean top-10 recall $mean too low (per-query: $recall)")
  }

  test("quantize_i8: max|x| maps to ±127, error bounded by half a step") {
    import graft.functions.VectorFunctions.quantizeI8
    val v = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f))).toDF("vec_id", "embedding")
    val q = v.select(quantizeI8(col("embedding"))).collect()(0).getSeq[Byte](0)
    assert(q == Seq[Byte](64, -127, 32, 0), s"got $q")
    // reconstruction error ≤ amax/127/2 per element
    val vec = Array(0.5, -1.0, 0.25, 0.0)
    val amax = 1.0
    q.zip(vec).foreach { case (qi, xi) =>
      assert(math.abs(qi * amax / 127.0 - xi) <= amax / 127.0 / 2 + 1e-12)
    }
  }

  test("PQ ANN: compressed-domain scoring is deterministic and finds plausible neighbors") {
    val queries = embeddings.filter(col("vec_id") < 5)
    def ranked(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val pq = ranked(Similarity.pqTopK(embeddings, queries, k = 10))
    assert(pq == ranked(Similarity.pqTopK(embeddings, queries, k = 10)),
      "code-domain ranking must be bit-stable")
    assert(pq.values.forall(_.length == 10))
    // 16-centroid seeded codebooks are coarse; still, the compressed-domain
    // ranking must beat random ordering against the float top-10 by a wide
    // margin (random overlap at corpus size ~2000 is ~0.005)
    val fTop = ranked(Similarity.bruteForceTopK(embeddings, queries, k = 10))
    val recall = fTop.keys.toSeq.map(q => pq(q).toSet.intersect(fTop(q).toSet).size.toDouble / 10.0)
    val mean = recall.sum / recall.size
    assert(mean >= 0.1, s"mean top-10 overlap $mean is no better than chance (per-query: $recall)")
  }

  test("near-dup pairs finds a planted duplicate vector at cosine 1") {
    val planted = embeddings.unionByName(
      embeddings.filter(col("vec_id") === 7).withColumn("vec_id", lit(100007L)))
    val pairs = Similarity.nearDupPairs(planted, threshold = 0.999)
      .select("doc_a", "doc_b", "cos_sim").as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 7L && p._2 == 100007L && p._3 > 0.999999),
      s"planted dup must be found, got ${pairs.toSeq}")
  }

  test("semantic dedup: planted same-cell duplicate is dropped, original kept") {
    val planted = embeddings.unionByName(
      embeddings.filter(col("vec_id") === 7).withColumn("vec_id", lit(100007L)))
    val out = Similarity.semanticDedup(planted, tau = 0.999, nlist = 16)
    assert(out.count() === planted.count(), "one row per vector, always")
    val byId = out.select("vec_id", "cell", "kept").as[(Long, Int, Boolean)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    // an exact copy lands in the same cell (identical argmax input) and is
    // pruned in favor of the smaller id
    assert(byId(7L)._1 === byId(100007L)._1, "copy must share the original's cell")
    assert(byId(7L)._2, "canonical (min id) is kept")
    assert(!byId(100007L)._2, "the planted copy is dropped")
    // at tau just above the corpus max off-diagonal cosine nothing else drops
    assert(byId.count(!_._2._2) === 1, "only the planted copy drops at tau=0.999")
  }

  test("recall@k counts overlap per query against truth size, not k") {
    // q0: truth {1,2,3}, approx recovers {1,3,9}      -> 2/3
    // q1: truth {4,5},   approx recovers both + noise -> 2/2
    // q2: truth {6},     approx recovers none         -> 0/1
    val truth = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3),
      (1L, 4L, 1), (1L, 5L, 2), (2L, 6L, 1)).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((0L, 1L, 1), (0L, 9L, 2), (0L, 3L, 3),
      (1L, 5L, 1), (1L, 4L, 2), (1L, 8L, 3), (2L, 7L, 1)).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.recallAtK(truth, approx, k = 3)
      .orderBy("query_id")
      .select("query_id", "n_truth", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 3L, 2L, 2.0 / 3), (1L, 2L, 2L, 1.0), (2L, 1L, 0L, 0.0)))
  }

  test("recall@k ignores ranks beyond k on both sides") {
    val truth = Seq((0L, 1L, 1), (0L, 2L, 2), (0L, 3L, 3)).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((0L, 2L, 1), (0L, 9L, 2), (0L, 1L, 3)).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.recallAtK(truth, approx, k = 2)
      .select("n_truth", "n_hit").as[(Long, Long)].head()
    assert(out == ((2L, 1L))) // truth {1,2}, approx {2,9} -> hit {2}
  }

  test("kmeansTrain: converges on this corpus and improves IVF recall over seeding") {
    val (mat, moves) = Similarity.kmeansTrain(embeddings, nlist = 8, iters = 4)
    assert(mat.length == 8 && mat.forall(_.length == 64))
    assert(mat.forall(c => math.sqrt(c.map(x => x * x).sum) > 0), "no degenerate centroid")
    // deterministic corpus: the movement curve must decay toward a fixpoint
    assert(moves.last < moves.head, s"movement must shrink: $moves")
    // training is deterministic end to end
    val (mat2, moves2) = Similarity.kmeansTrain(embeddings, nlist = 8, iters = 4)
    assert(moves2 == moves && mat2.zip(mat).forall { case (a, b) => a.sameElements(b) })
  }

  test("contrastivePairs: one same-cell positive, k other-cell negatives, deterministic") {
    val anchors = embeddings.filter(col("vec_id") < 5)
    val out = Similarity.contrastivePairs(embeddings, anchors, kNeg = 3, nlist = 8)
      .select("query_id", "pair_type", "other_id", "cos_sim")
      .as[(Long, String, Long, Double)].collect().toSeq
    val byAnchor = out.groupBy(_._1)
    assert(byAnchor.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byAnchor.values.foreach { rows =>
      assert(rows.count(_._2 == "positive") <= 1)
      assert(rows.count(_._2 == "negative") == 3)
      rows.foreach { case (q, _, o, _) => assert(q != o) }
    }
    // the positive really is the nearest same-cell neighbor: its cosine
    // beats every negative's for that anchor (negatives are other-cell
    // and this corpus clusters by construction)
    val again = Similarity.contrastivePairs(embeddings, anchors, kNeg = 3, nlist = 8)
      .select("query_id", "pair_type", "other_id", "cos_sim")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(again.toSet == out.toSet, "deterministic across runs")
  }

  test("embeddingProfile: hand-computed norms, zero-norm count, fixed-point mean") {
    val vs = Seq(
      (1L, Seq(3.0f, 4.0f), 0),   // norm 5
      (2L, Seq(0.0f, 0.0f), 0),   // zero norm
      (3L, Seq(6.0f, 8.0f), 1))   // norm 10
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.embeddingProfile(vs).orderBy("label")
      .select("label", "n_vectors", "dim_min", "dim_max", "n_zero_norm",
        "norm_min", "norm_max", "norm_avg")
      .as[(Int, Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      (0, 2L, 2L, 2L, 1L, 0.0, 5.0, 2.5),
      (1, 1L, 2L, 2L, 0L, 10.0, 10.0, 10.0)))
  }

  test("kmeansStep: counts partition the corpus and means match a driver-side Lloyd step") {
    val nlist = 4
    val out = Similarity.kmeansStep(embeddings, nlist = nlist)
      .select("cell", "dim", "n_members", "sum_scaled", "mean")
      .as[(Int, Int, Long, Long, Double)].collect()

    val corpusSize = embeddings.count()
    val dims = embeddings.select(size(col("embedding"))).as[Int].head()
    // every dim's member counts sum to the corpus size (each vector in exactly one cell)
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == corpusSize)
    }
    assert(out.length == nlist * dims || out.map(_._1).distinct.length < nlist)

    // driver-side replay: same seeded centroids, same argmax, same fixed point
    val all = embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    val seedRank = all.map { case (id, _) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(md5.take(15), 16) & 0x7FFFFFFFL, id)
    }.sorted.take(nlist).map(_._2)
    val cents = seedRank.map(id => all.find(_._1 == id).get._2.map(_.toDouble))
    val cnrms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    def cellOf(v: Seq[Float]): Int = {
      val scores = cents.zip(cnrms).map { case (c, n) =>
        v.map(_.toDouble).zip(c).map { case (a, b) => a * b }.sum / n }
      scores.zipWithIndex.maxBy { case (s, i) => (s, -i) }._2
    }
    val expected = all.groupBy { case (_, v) => cellOf(v) }.flatMap { case (cell, vs) =>
      (0 until dims).map { d =>
        // HALF_UP on the shortest decimal repr — Spark's round() semantics
        // (math.round would round -x.5 towards +inf, not away from zero)
        val sum = vs.map { case (_, v) =>
          BigDecimal(v(d).toDouble * 1000000L)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
        (cell, d) -> (vs.length.toLong, sum)
      }
    }
    out.foreach { case (cell, dim, n, sum, mean) =>
      val (en, esum) = expected((cell, dim))
      assert(n == en && sum == esum, s"cell=$cell dim=$dim")
      assert(mean == sum.toDouble / 1000000L / n)
    }
  }

  test("embeddingDrift: identical slices cos≈1, opposite slices cos=-1, one-sided label → 0") {
    val a = Array(1.0f, 0.0f, 2.0f)
    val docs = Seq(
      (0L, 1, a), (1L, 1, a),                                   // label 1: same proto both slices
      (2L, 2, a), (3L, 2, a.map(-_)),                            // label 2: new slice negated
      (4L, 3, a)                                                 // label 3: old slice only
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.embeddingDrift(docs, isNew = col("vec_id") % 2 === 1)
      .orderBy("label")
      .select("label", "n_old", "n_new", "proto_cos")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got(0)._1 == 1 && got(0)._2 == 1 && got(0)._3 == 1 && math.abs(got(0)._4 - 1.0) < 1e-12)
    assert(got(1)._1 == 2 && math.abs(got(1)._4 + 1.0) < 1e-12)
    assert(got(2) == ((3, 1L, 0L, 0.0)), "one-sided label scores 0 by contract")
  }

  test("prototypicalityPrune: two-level rank equals the one global window; prune rule exact") {
    import org.apache.spark.sql.expressions.Window
    val got = Similarity.prototypicalityPrune(embeddings, prunePct = 10)
    // one row per vector, ranks are a permutation of 1..n within label
    val n = embeddings.count()
    assert(got.count() == n)
    val bad = got.groupBy("label")
      .agg(count(lit(1)).as("cnt"), max("rank").as("mx"), min("rank").as("mn"),
        countDistinct("rank").as("dr"))
      .filter(col("mx") =!= col("cnt") || col("mn") =!= 1 || col("dr") =!= col("cnt"))
    assert(bad.count() == 0, "per-label ranks must be a 1..n permutation")
    // the two-level rank must equal the single global per-label window
    val wGlobal = Window.partitionBy("label")
      .orderBy(col("proto_sim").desc, col("vec_id").asc)
    val mismatch = got
      .withColumn("grank", row_number().over(wGlobal).cast("long"))
      .filter(col("rank") =!= col("grank"))
    assert(mismatch.count() == 0, "two-level rank diverged from the global window")
    // prune rule: exactly n_label*10 div 100 rows pruned per label, the top ones
    val counts = got.groupBy("label")
      .agg(max("n_label").as("nl"),
        sum(when(col("pruned"), 1L).otherwise(0L)).as("np"),
        max(when(col("pruned"), col("rank"))).as("maxPrunedRank"))
      .select("nl", "np", "maxPrunedRank")
      .as[(Long, Long, Option[Long])].collect()
    counts.foreach { case (nl, np, mx) =>
      assert(np == nl * 10 / 100)
      assert(mx.forall(_ == np), "pruned rows must be exactly ranks 1..np")
    }
    // zero-norm guard: score is 0.0, never NaN
    assert(got.filter(col("proto_sim").isNaN).count() == 0)
  }

  test("C86: anisotropy direction matches a double-precision power method") {
    val emb = graft.queries.Tables(spark, sfDir).embeddings
    val got = Similarity.anisotropy(emb)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 64)
    assert(got.map(r => math.abs(r._2)).max == 10000L, "renormalized to max-abs 1e4")
    val (lam, tr, share) = (got.head._3, got.head._4, got.head._5)
    assert(got.forall(r => r._3 == lam && r._4 == tr && r._5 == share))
    assert(lam > 0 && lam <= tr && share > 0 && share <= 1000)

    // double-precision reference: the SAME 8 power rounds over the same
    // milli-scaled second moments — the operator's contract is an exact
    // replay of the method, not convergence (that depends on the data's
    // eigengap; λ after k rounds is a lower bound on the dominant
    // eigenvalue, and this synthetic corpus is nearly isotropic)
    val vecs = emb.select("embedding").as[Seq[Float]].collect()
      .map(_.map(x => math.round(x.toDouble * 1000).toDouble).toArray)
    val d = 64
    val m = Array.ofDim[Double](d, d)
    vecs.foreach { v =>
      var i = 0
      while (i < d) { var j = 0; while (j < d) { m(i)(j) += v(i) * v(j); j += 1 }; i += 1 }
    }
    var vv = Array.fill(d)(1.0)
    var lamD = 0.0
    for (_ <- 1 to 8) {
      val u = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * vv(j)).sum)
      val mx = u.map(math.abs).max
      lamD = mx
      vv = u.map(_ / mx)
    }
    assert(math.abs(lam.toDouble - lamD) / lamD < 0.005,
      s"integer λ=$lam vs double λ=$lamD at the same round count")
    val cos = {
      val a = got.map(_._2.toDouble)
      val dot = a.zip(vv).map { case (x, y) => x * y }.sum
      math.abs(dot) / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(vv.map(x => x * x).sum))
    }
    assert(cos > 0.999, s"direction cosine $cos")
  }

  test("C88: all-but-the-top removal — invariants + an anisotropic fixture") {
    val emb = graft.queries.Tables(spark, sfDir).embeddings
    val got = Similarity.removeTopDirection(emb)
      .as[(Long, Long, Long, Long, Option[Long], Long)].collect()
    assert(got.length == emb.count())
    got.foreach { case (id, dot, energy, removed, pm, res) =>
      assert(removed >= 0 && removed <= energy,
        s"vec $id: removed $removed outside [0, $energy]")
      assert(pm.forall(p => p >= 0 && p <= 1000))
      // truncation bound: |res_dot| < Σ|v_i| ≤ d·10⁴
      assert(math.abs(res) <= 64L * 10000L, s"vec $id residual dot $res")
      // in real arithmetic the residual dot is EXACTLY 0; the integer
      // residue must be negligible next to the dot it cancelled
      if (math.abs(dot) > 10000000L)
        assert(math.abs(res).toDouble / math.abs(dot) < 0.01)
    }

    // a strongly anisotropic fixture: vectors clustered along one axis —
    // removal must take out almost all of each aligned vector's energy
    import spark.implicits._
    val d = 8
    val aligned = (0 until 200).map { k =>
      val v = Array.fill(d)(0.001f * (k % 3 - 1))
      v(2) = 1.0f + 0.01f * (k % 7) // dominant axis with slight spread
      (k.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    val corr = Similarity.removeTopDirection(aligned)
      .as[(Long, Long, Long, Long, Option[Long], Long)].collect()
    corr.foreach { case (id, _, _, _, pm, _) =>
      assert(pm.exists(_ > 990), s"aligned vec $id kept ${pm} pm on the axis")
    }
  }

  // ---------------------------------------- C138: k-center selection

  test("C138: farthest-point traversal picks one center per planted cluster") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // three orthogonal clusters of near-duplicates
    val rows = Seq(
      (1L, v(1.0, 0.01, 0.0)), (2L, v(0.99, 0.02, 0.0)), (3L, v(1.0, 0.0, 0.01)),
      (10L, v(0.0, 1.0, 0.01)), (11L, v(0.01, 0.99, 0.0)),
      (20L, v(0.0, 0.01, 1.0)), (21L, v(0.01, 0.0, 0.99)))
    val got = Similarity.kCenterSelect(rows.toDF("vec_id", "embedding"), k = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.head == ((1L, 1L, 0L)), "seed is the smallest id at radius 0")
    val clusters = got.map(_._2).map(id => id / 10).toSet
    assert(clusters == Set(0L, 1L, 2L), s"one pick per cluster: ${got.toSeq}")
    // radius sequence non-increasing after rank 2
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b }, s"radii: ${radii.toSeq}")
  }

  test("C138: k larger than the corpus stops cleanly; duplicates get radius 0 last") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq((1L, v(1.0, 0.0)), (2L, v(1.0, 0.0)), (3L, v(0.0, 1.0)))
    val got = Similarity.kCenterSelect(rows.toDF("vec_id", "embedding"), k = 10)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.length == 3, s"stops at corpus size: ${got.toSeq}")
    assert(got.map(_._2).toSeq == Seq(1L, 3L, 2L), "farthest first, duplicate last")
    assert(got(2)._3 == 0L, "the exact duplicate is picked at radius 0")
  }

  // ---------------------------------------- C133: MMR re-ranking

  test("C133: MMR demotes the near-duplicate twin that plain top-k ranks second") {
    // query q; a and a' nearly identical (both closest to q); b diverse
    // but still relevant. Plain top-2 = (a, a'); MMR top-2 = (a, b).
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val rows = Seq(
      (100L, v(1.0, 0.0, 0.0, 0.0)),             // the query
      (1L, v(0.98, 0.20, 0.0, 0.0)),             // a
      (2L, v(0.97, 0.22, 0.01, 0.0)),            // a' — near-dup of a
      (3L, v(0.93, -0.36, 0.0, 0.0)),            // b — diverse, relevant
      (4L, v(0.0, 0.0, 1.0, 0.0)))               // far away
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.mmrRerank(df, df.filter(col("vec_id") === 100L),
        m = 4, k = 3, lambdaPm = 700L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2)
    val picks = got.map(_._3).toSeq
    assert(picks.take(2) == Seq(1L, 3L), s"MMR must pick the diverse doc second: $picks")
    assert(picks(2) == 2L, s"the twin comes third: $picks")
    // sanity: plain similarity order would have been (1, 2, ...)
    val plain = Similarity.bruteForceTopK(df, df.filter(col("vec_id") === 100L), k = 2)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L), s"plain top-2: $plain")
  }

  test("C133: lambda=1000 degenerates to plain similarity order") {
    val sample = embeddings.filter(col("vec_id") < 40)
    val queries = sample.filter(col("vec_id") === 0L)
    val mmr = Similarity.mmrRerank(sample, queries, m = 8, k = 4, lambdaPm = 1000L)
      .orderBy("mmr_rank").select("doc_id").as[Long].collect().toSeq
    val plain = Similarity.bruteForceTopK(sample, queries, k = 4)
      .orderBy("rank").select("neighbor_id").as[Long].collect().toSeq
    assert(mmr == plain, s"mmr=$mmr plain=$plain")
  }

  // ---------------------------------------- C130: JL projection

  /** Driver-side double replay with the identical fold order. */
  private def jlRef(v: Array[Float], j: Int): Double = {
    val prods = (0 until v.length).map { d =>
      val s = if (Similarity.hyperplane(101, j, d) >= 0) 1.0 else -1.0
      v(d).toDouble * s
    }
    prods.foldLeft(0.0)(_ + _) / 4.0
  }

  test("C130: jlProject matches the driver-side fold bit-for-bit; r entries per vector") {
    val sample = embeddings.filter(col("vec_id") < 20)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    val got = Similarity.jlProject(embeddings.filter(col("vec_id") < 20), r = 16, dims = 64)
      .as[(Long, Array[Double])].collect().toMap
    assert(got.keySet == sample.keySet && got.values.forall(_.length == 16))
    for ((id, v) <- sample; j <- 0 until 16)
      assert(got(id)(j) == jlRef(v, j), s"vec $id dim $j")
  }

  test("C130: distortion audit — ratios center on 1000 per-mille and match the double replay") {
    val dist = Similarity.jlDistortion(embeddings, r = 16, dims = 64)
      .as[(Long, Long, Double, Double, Option[Long])].collect()
    assert(dist.nonEmpty)
    val ratios = dist.flatMap(_._5)
    val mean = ratios.sum.toDouble / ratios.size
    assert(math.abs(mean - 1000.0) < 200.0, s"mean ratio $mean far from 1000")
    // exact replay of one pair
    val vecs = embeddings.filter(col("vec_id") < 2)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
    if (vecs.size == 2) {
      val (va, vb) = (vecs(0L), vecs(1L))
      val d2o = (0 until 64).map { d =>
        val diff = va(d).toDouble - vb(d).toDouble; diff * diff
      }.foldLeft(0.0)(_ + _)
      val d2p = (0 until 16).map { j =>
        val diff = jlRef(va, j) - jlRef(vb, j); diff * diff
      }.foldLeft(0.0)(_ + _)
      val row = dist.find(_._1 == 0L).get
      assert(row._3 == d2o && row._4 == d2p, s"pair(0,1): $row vs ($d2o, $d2p)")
      assert(row._5.contains(math.floor(1000.0 * d2p / d2o).toLong))
    }
  }
}
