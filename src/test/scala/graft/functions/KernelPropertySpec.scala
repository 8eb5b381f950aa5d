package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests: every native kernel must equal the composable (HOF /
  * explode-aggregate) formulation it replaced, on arbitrary inputs — not
  * just the fixtures the unit specs pin. Deterministic seeds, so failures
  * reproduce. */
class KernelPropertySpec extends SparkSuite {
  import spark.implicits._

  private val tokenGen = Gen.nonEmptyListOf(
    Gen.oneOf(Gen.alphaNumStr.map(_.take(8)), Gen.oneOf("", "a", "the", "日本", "x y")))

  /** n deterministic samples of g. */
  private def samples[A](g: Gen[List[A]], n: Int): Seq[List[A]] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: RollingHash (both modes) == the interpreted fold, random docs") {
    val M = 562949953421231L
    val docs = samples(tokenGen, 60).map(_.mkString(" ")).toDF("text")
    val hofXx = aggregate(split(col("text"), " "), lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(M)), lit(M)))
    val hofMd5 = aggregate(split(col("text"), " "), lit(0L),
      (acc, t) => pmod(acc * 31 + graft.operators.Dedup.portableHash31(t), lit(M)))
    val bad = docs.select(
        (RollingHashFunctions.rollingHash(split(col("text"), " ")) === hofXx).as("xx"),
        (RollingHashFunctions.rollingHash(split(col("text"), " "), portable = true) === hofMd5).as("md5"))
      .filter(!col("xx") || !col("md5")).count()
    assert(bad == 0)
  }

  test("property: MinHashSignature == min-aggregated xxhash64(h, p), random hash arrays") {
    val numPerm = 16
    val arrays = samples(Gen.nonEmptyListOf(Gen.long), 60)
    val df = arrays.zipWithIndex.map { case (hs, i) => (i.toLong, hs) }.toDF("id", "hs")
    val fromKernel = df.select(col("id"),
      SignatureFunctions.minhashSignature(col("hs"), numPerm).as("sig"))
    val fromAgg = df.select(col("id"), explode(col("hs")).as("h"))
      .groupBy("id")
      .agg(array((0 until numPerm).map(p => min(xxhash64(col("h"), lit(p)))): _*).as("sig"))
    val mismatches = fromKernel.join(fromAgg.withColumnRenamed("sig", "sig2"), "id")
      .filter(col("sig") =!= col("sig2")).count()
    assert(mismatches == 0)
  }

  test("property: SimHash64 == exploded 64-column vote aggregation, random docs") {
    val docsSeq = samples(tokenGen, 40)
    val df = docsSeq.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      .toDF("id", "text")
    val fromKernel = df.select(col("id"),
      SignatureFunctions.simhash64(split(col("text"), " ")).as("sig"))
    val tok = df.select(col("id"), explode(split(col("text"), " ")).as("t"))
      .select(col("id"), xxhash64(col("t")).as("h"))
    val voteCols = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"v$i"))
    val fromAgg = tok.groupBy("id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("id"),
        (0 until 64).map(i => when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_ + _).as("sig2"))
    val mismatches = fromKernel.join(fromAgg, "id").filter(col("sig") =!= col("sig2")).count()
    assert(mismatches == 0)
  }

  test("property: PortableShingleHashes == distinct md5 of window-joined shingles") {
    val docsSeq = samples(Gen.listOfN(5, Gen.alphaNumStr.map(_.take(6))), 40)
      .filter(_.length >= 3)
    val df = docsSeq.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
      .toDF("id", "text")
    val fromKernel = df.select(col("id"),
        explode(SignatureFunctions.portableShingleHashes(split(col("text"), " "), 3)).as("h"))
      .as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id").orderBy("pos")
    val fromSql = df
      .select(col("id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("id"),
        concat_ws(" ", col("tok"), lead("tok", 1).over(w), lead("tok", 2).over(w)).as("s"),
        lead("tok", 2).over(w).isNotNull.as("full"))
      .filter(col("full"))
      .select(col("id"), graft.operators.Dedup.portableHash31(col("s")).as("h"))
      .distinct()
      .as[(Long, Long)].collect().toSet
    assert(fromKernel == fromSql)
  }

  test("property: DotProduct == driver-side double fold, random float vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    val pairs = (0 until 50).flatMap { i =>
      for {
        a <- vecGen(Gen.Parameters.default, Seed(i.toLong * 2))
        b <- vecGen(Gen.Parameters.default, Seed(i.toLong * 2 + 1))
      } yield (a, b)
    }
    val df = pairs.toDF("a", "b")
    val got = df.select(VectorFunctions.dotProduct(col("a"), col("b")).as("d"))
      .as[Double].collect()
    val expected = pairs.map { case (a, b) =>
      a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    }
    got.zip(expected).foreach { case (g, e) => assert(g == e, "bit-exact fold") }
  }

  test("property: CentroidScores/BestCentroid == the composed per-cell dot products") {
    val dims = 8
    val vecGen = Gen.listOfN(dims, Gen.chooseNum(-5f, 5f))
    val vecs = (0 until 60).flatMap(i => vecGen(Gen.Parameters.default, Seed(100L + i)))
      .map(_.toArray).toSeq
    val cents = (0 until 5).flatMap(i => vecGen(Gen.Parameters.default, Seed(900L + i)))
      .map(_.map(_.toDouble).toArray).toArray
    val norms = cents.map(c => math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x)))
    val df = vecs.map(Tuple1(_)).toDF("v")
    val composed = cents.zip(norms).map { case (c, n) =>
      VectorFunctions.dotProduct(col("v"), typedlit(c.toSeq)) / lit(n)
    }
    val best = {
      val ss = composed
      val mx = greatest(ss: _*)
      ss.zipWithIndex.foldRight(lit(-1)) { case ((s, i), acc) =>
        when(s === mx, lit(i)).otherwise(acc)
      }
    }
    val bad = df.select(
        (VectorFunctions.centroidScores(col("v"), cents, norms) === array(composed: _*)).as("sc"),
        (VectorFunctions.bestCentroid(col("v"), cents, norms) === best).as("bc"))
      .filter(!col("sc") || !col("bc")).count()
    assert(bad == 0, "kernel must equal the composed literal-dot form bit-for-bit")
  }

  test("centroid kernels reject zero-norm centroids at construction") {
    // a zero centroid scores 0/0 = NaN: the kernel's strict `>` would skip it
    // while DuckDB's ORDER BY DESC ranks NaN first — fail fast instead
    val cents = Array(Array(1.0, 0.0), Array(0.0, 0.0))
    val norms = Array(1.0, 0.0)
    val e1 = intercept[IllegalArgumentException](
      VectorFunctions.bestCentroid(col("v"), cents, norms))
    assert(e1.getMessage.contains("zero-norm"))
    val e2 = intercept[IllegalArgumentException](
      VectorFunctions.centroidScores(col("v"), cents, norms))
    assert(e2.getMessage.contains("zero-norm"))
  }

  test("property: QuantizeI8 == the driver-side quantization formula") {
    val vecGen = Gen.listOfN(12, Gen.chooseNum(-100f, 100f))
    val vecs = (0 until 80).flatMap(i => vecGen(Gen.Parameters.default, Seed(500L + i)))
      .map(_.toArray).toSeq :+ Array(0f, 0f, 0f) // zero vector edge
    val got = vecs.map(Tuple1(_)).toDF("v")
      .select(VectorFunctions.quantizeI8(col("v")))
      .collect().map(_.getSeq[Byte](0).toSeq)
    val expected = vecs.map { v =>
      val amax = v.foldLeft(0.0)((m, x) => math.max(m, math.abs(x.toDouble)))
      if (amax == 0) Seq.fill(v.length)(0: Byte)
      else v.toSeq.map { x =>
        val r = math.floor(x.toDouble * 127.0 / amax + 0.5)
        math.max(-127.0, math.min(127.0, r)).toByte
      }
    }
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"$g != $e") }
  }

  test("property: CharHistogram == driver-side codepoint binning, random docs") {
    val docs = samples(tokenGen, 60).map(_.mkString(" ")).toDF("text")
    val got = docs.select(col("text"), TextFunctions.charHistogram(col("text")))
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toSeq)
    got.foreach { case (text, hist) =>
      val exp = new Array[Int](28)
      text.codePoints().forEach { cp =>
        if (cp == 32) exp(0) += 1
        else if (cp >= 'a' && cp <= 'z') exp(cp - 96) += 1
        else exp(27) += 1
      }
      assert(hist == exp.toSeq, s"histogram mismatch for '$text'")
    }
  }

  test("property: L1Distance bound never prunes a true Levenshtein pair") {
    val docs = samples(tokenGen, 40).map(_.mkString(" "))
    val pairs = for (a <- docs; b <- docs) yield (a, b)
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        TextFunctions.l1Distance(TextFunctions.charHistogram(col("a")),
          TextFunctions.charHistogram(col("b"))).as("l1"),
        levenshtein(col("a"), col("b")).cast("long").as("lev"))
      .as[(String, String, Long, Long)].collect()
    rows.foreach { case (a, b, l1, lev) =>
      // the completeness invariant the q88 prefilter rests on
      assert(lev >= (l1 + 1) / 2, s"bound violated: lev=$lev l1=$l1 for '$a' vs '$b'")
    }
    assert(rows.exists(r => r._3 > 0), "fixture exercises non-identical pairs")
  }
}
