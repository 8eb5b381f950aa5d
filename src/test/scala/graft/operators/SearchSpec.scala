package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C124: the accelerated search must EXACTLY equal the full-scan
  * contains on every fixture — boundary hits, repeated grams, short
  * patterns (scan fallback), too-short documents. */
class SearchSpec extends SparkSuite {
  import spark.implicits._

  private def scan(rows: Seq[(Long, String)], pat: String): Set[Long] =
    rows.filter(_._2.contains(pat)).map(_._1).toSet

  private def run(rows: Seq[(Long, String)], pat: String, n: Int = 8): Set[Long] =
    Search.substringSearch(rows.toDF("doc_id", "text"),
      col("doc_id"), col("text"), pat, n).as[Long].collect().toSet

  test("C124: equals the full scan on a random corpus, several patterns") {
    val rnd = new scala.util.Random(47)
    val words = Seq("table", "scan", "merge", "spark", "window", "data", "row")
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(30))(words(rnd.nextInt(words.size))).mkString(" ")))
    for (pat <- Seq("table scan", "spark window me", "data row data", "scan merge"))
      assert(run(rows, pat) == scan(rows, pat), s"pattern '$pat'")
  }

  test("C124: boundary hits — pattern at the very start and end of the text") {
    val rows = Seq((1L, "needle in the haystack"), (2L, "find the needle"),
      (3L, "nee dle split"), (4L, "needl"))
    assert(run(rows, "needle") == Set(1L, 2L))
    assert(scan(rows, "needle") == Set(1L, 2L))
  }

  test("C124: repeated grams in the pattern do not double-count candidates") {
    // pattern 'abababab...' has far fewer DISTINCT grams than positions
    val rows = Seq((1L, "xx abababababab yy"), (2L, "xx ababab yy"))
    val pat = "abababababab" // 12 chars, grams all in {abababab, babababa}
    assert(run(rows, pat) == scan(rows, pat))
    assert(run(rows, pat) == Set(1L))
  }

  test("C124: short patterns fall back to the scan; too-short docs never match") {
    val rows = Seq((1L, "ab"), (2L, "abcdefgh"), (3L, "zabz"))
    assert(run(rows, "ab") == Set(1L, 2L, 3L)) // < n → scan path
    assert(run(rows, "abcdefgh") == Set(2L)) // == n; doc 1 too short
  }

  // ---- C126: BM25 ranked retrieval ----

  /** Independent Scala replay of the fixed-point log2 contract. */
  private def log2q10Ref(x: Long): Long = {
    require(x >= 1)
    val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (e >= 20) x >> (e - 20) else x << (20 - e)
    var acc = e.toLong * 1024L
    var w = 512L
    for (_ <- 1 to 10) {
      val sq = m * m / 1048576L
      if (sq >= 2097152L) { m = m * m / 2097152L; acc += w } else m = sq
      w /= 2
    }
    acc
  }

  test("C126: log2q10 SQL matches the integer reference and true log2 within quantization") {
    val xs = Seq(1L, 2L, 3L, 5L, 7L, 1023L, 1024L, 1025L, 123456L,
      1000000007L, 1000000000000000L, 1L << 62)
    val got = xs.toDF("x").selectExpr("x", Search.log2q10Sql("x") + " AS l")
      .as[(Long, Long)].collect().toMap
    for (x <- xs) {
      assert(got(x) == log2q10Ref(x), s"x=$x")
      assert(math.abs(got(x) / 1024.0 - math.log(x.toDouble) / math.log(2.0)) < 0.002,
        s"quantization drift at $x")
    }
  }

  /** Independent Scala brute-force BM25 with the operator's exact-integer
    * contract (k1=1.2, b=0.75 per-mille; BigInt length-norm product). */
  private def bm25Ref(rows: Seq[(Long, String)], queries: Seq[(Int, String)],
                      k: Int): Seq[(Int, Long, Long, Long, Long)] = {
    val toks = rows.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = rows.size.toLong
    val l = toks.values.map(_.size.toLong).sum
    val terms = queries.flatMap(_._2.split(" ")).distinct
    val df = terms.map(t => t -> rows.count(r => toks(r._1).contains(t)).toLong).toMap
    queries.flatMap { case (qid, qtext) =>
      val qterms = qtext.split(" ").distinct.toSeq
      val scored = rows.flatMap { case (id, _) =>
        val dl = toks(id).size.toLong
        val dlnorm = (BigInt(1000) * dl * n / l).toLong
        val parts = qterms.flatMap { t =>
          val tf = toks(id).count(_ == t).toLong
          if (tf == 0) None else {
            val idf = log2q10Ref(2 * n + 2) - log2q10Ref(2 * df(t) + 1)
            val tfs = tf * 2200L * 1000000L /
              (tf * 1000000L + 1200L * (1000L * 250L + 750L * dlnorm))
            Some(idf * tfs)
          }
        }
        if (parts.isEmpty) None else Some((id, parts.sum, parts.size.toLong))
      }
      scored.sortBy { case (id, s, _) => (-s, id) }.take(k).zipWithIndex.map {
        case ((id, s, nt), i) => (qid, (i + 1).toLong, id, s, nt)
      }
    }
  }

  test("C126: bm25TopK equals the integer brute force on a mixed fixture") {
    val rows = Seq(
      (1L, "spark join agg spark spark join"),
      (2L, "table scan slow slow table"),
      (3L, "spark window data row"),
      (4L, "join join join agg agg table"),
      (5L, "merge sort hash hash window batch"),
      (6L, "data row value key"),
      (7L, "spark join agg table scan"))
    val queries = Seq(1 -> "spark join", 2 -> "slow scan table", 3 -> "quantum")
    val got = Search.bm25TopK(rows.toDF("doc_id", "text"), queries, k = 3)
      .as[(Int, Long, Long, Long, Long)].collect().toSet
    val want = bm25Ref(rows, queries, 3).toSet
    assert(got == want)
    // OOV-only query matches nothing
    assert(!got.exists(_._1 == 3))
    // saturation sanity: doc 4 (tf=3 join) must rank above doc 3 (tf=1
    // of one term) for query 1
    val r1 = got.filter(_._1 == 1).toSeq.sortBy(_._2).map(_._3)
    assert(r1.nonEmpty && r1.take(2).forall(Seq(1L, 4L, 7L).contains))
  }

  // ---- C136: PRF expansion ----

  test("C156: Dirichlet QL equals the integer brute force; priors and length norm behave") {
    val docs = Seq(
      (1L, "spark join agg spark"),             // all three terms, short
      (2L, "spark join filler filler filler filler filler filler"), // two terms, long
      (3L, "spark"),                            // one term, shortest
      (4L, "filler filler filler"))             // no terms: not a candidate
    val mu = 2000L
    val qTerms = Seq("spark", "join", "agg")
    // brute replay in exact integers
    val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val m = toks.values.map(_.size).sum.toLong
    val g = qTerms.map(t => t -> toks.values.flatten.count(_ == t).toLong).toMap
    def score(id: Long): Long = {
      val dl = toks(id).size.toLong
      qTerms.filter(g(_) > 0).map { t =>
        val tf = toks(id).count(_ == t).toLong
        log2q10Ref(tf * m + mu * g(t)) - log2q10Ref((dl + mu) * m)
      }.sum
    }
    val got = Search.dirichletQlTopK(docs.toDF("doc_id", "text"),
        Seq(1 -> "spark join agg"), k = 10, mu = mu)
      .as[(Int, Long, Long, Long, Long)].collect()
    // doc 4 matches nothing: not in the candidates
    assert(got.map(_._3).toSet == Set(1L, 2L, 3L))
    for (r <- got) assert(r._4 == score(r._3), s"doc ${r._3}: ${r._4} vs ${score(r._3)}")
    // ranking: all-terms short doc first; scores are negative log-probs
    assert(got.find(_._2 == 1L).get._3 == 1L)
    assert(got.forall(_._4 < 0L))
    // n_match counts only present terms
    assert(got.find(_._3 == 2L).get._5 == 2L && got.find(_._3 == 3L).get._5 == 1L)
    // an OOV query term (zero collection frequency) changes nothing
    val withOov = Search.dirichletQlTopK(docs.toDF("doc_id", "text"),
        Seq(1 -> "spark join agg zzznever"), k = 10, mu = mu)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(withOov.map(r => (r._2, r._3, r._4)).toSet ==
      got.map(r => (r._2, r._3, r._4)).toSet)
  }

  test("C136: expansion surfaces a vocabulary-mismatched doc plain BM25 cannot see") {
    // 'alpha' docs consistently co-occur with 'beta'; doc 99 says only
    // 'beta beta' — invisible to the query 'alpha', surfaced after PRF
    // mines 'beta' from the feedback set.
    // beta is frequent WITHIN the feedback docs (tf 2 each) and present
    // in enough docs that its Σtf·idf beats each doc's rare filler term
    val rows = Seq(
      (1L, "alpha beta beta u1"),
      (2L, "alpha beta beta u2"),
      (3L, "alpha beta beta u3"),
      (4L, "alpha beta beta u4"),
      (5L, "alpha beta beta u5"),
      (99L, "beta beta"),
      (100L, "unrelated filler junk"),
      (101L, "u1 u2"))
    val df = rows.toDF("doc_id", "text")
    val plain = Search.bm25TopK(df, Seq(1 -> "alpha"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!plain.contains(99L), "plain BM25 must not see the beta-only doc")
    val prf = Search.prfExpandedBm25(df, Seq(1 -> "alpha"), f = 3, e = 1, lambdaPm = 400L, k = 10)
      .as[(Int, Long, Long, Long, Long)].collect()
    val prfDocs = prf.map(_._3).toSet
    assert(prfDocs.contains(99L), s"PRF must surface doc 99: $prfDocs")
    assert(!prfDocs.contains(100L), "a doc matching nothing stays invisible")
    // the alpha docs still outrank the expansion-only doc (w 1000 vs 400)
    val rank99 = prf.find(_._3 == 99L).get._2
    val rank1 = prf.find(_._3 == 1L).get._2
    assert(rank1 < rank99, s"original-term docs outrank expansion-only: $prf")
  }

  test("C136: original query terms are never mined as expansion terms") {
    // every feedback doc is dominated by the original term itself; with
    // e=1 the expansion must pick the runner-up ('gamma'), not 'alpha' —
    // visible through doc 50 (gamma-only) being surfaced while doc 51
    // (delta-only) is not.
    val rows = Seq(
      (1L, "alpha gamma gamma gamma x1"),
      (2L, "alpha gamma gamma delta"),
      (3L, "alpha gamma delta"),
      (50L, "gamma gamma"),
      (51L, "delta delta"),
      (52L, "omega omega"))
    val df = rows.toDF("doc_id", "text")
    val prf = Search.prfExpandedBm25(df, Seq(1 -> "alpha"), f = 3, e = 1, lambdaPm = 400L, k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(prf.contains(50L) && !prf.contains(51L) && !prf.contains(52L), s"$prf")
  }

  // ---- C135: best-window snippet ----

  test("C135: the densest window wins; ties go earliest; repeats count") {
    // doc 1: two 'x' matches far apart, then a dense cluster near the end.
    // with w=4 the cluster window must win; doc 2 has two equal-score
    // single-match windows -> the earlier one is chosen.
    val rows = Seq(
      (1L, "x a a a a a a a x a x x x a"),
      (2L, "a a x a a a a a a x a a"),
      (3L, "no match here at all"),
      (4L, "x y x y"))
    val got = Search.bestSnippet(rows.toDF("doc_id", "text"),
        Seq(1 -> "x"), w = 4, k = 3)
      .as[(Int, Long, Long, Long, Long, String)].collect()
      .map(r => r._3 -> ((r._4, r._6))).toMap
    // doc 1 cluster: positions of x are 0,8,10,11,12 -> window at 10
    // holds x,x,x (3 matches); window at 8 holds x,-,x,x (3 matches too,
    // anchored earlier) -> earliest max wins: pos 8
    assert(got(1L)._1 == 8L, s"doc1: ${got(1L)}")
    assert(got(1L)._2 == "x a x x", s"doc1 snippet: ${got(1L)}")
    assert(got(2L)._1 == 2L, s"doc2 earliest tie: ${got(2L)}")
    assert(!got.contains(3L), "no-match docs cannot be in the BM25 top")
    // doc 4: both x windows hold 2 matches; earliest anchor 0
    assert(got(4L)._1 == 0L && got(4L)._2 == "x y x y")
  }

  test("C135: snippet truncates cleanly at the end of the document") {
    val rows = Seq((1L, "a b target"), (2L, "filler filler filler"))
    val got = Search.bestSnippet(rows.toDF("doc_id", "text"),
        Seq(1 -> "target"), w = 8, k = 1)
      .as[(Int, Long, Long, Long, Long, String)].collect()
    assert(got.length == 1 && got.head._4 == 2L && got.head._6 == "target")
  }

  // ---- C134: phrase search ----

  private def bruteCounts(rows: Seq[(Long, String)], phrase: String): Map[Long, Long] = {
    val p = phrase.split(" ").toSeq
    rows.flatMap { case (id, t) =>
      val w = t.split(" ").toSeq
      val c = (0 to w.size - p.size).count(i => w.slice(i, i + p.size) == p).toLong
      if (c > 0) Some(id -> c) else None
    }.toMap
  }

  private def phrase(rows: Seq[(Long, String)], p: String): Map[Long, Long] =
    Search.phraseSearch(rows.toDF("doc_id", "text"), p)
      .as[(Long, Long)].collect().toMap

  test("C134: equals the sliding-window scan on a random corpus, several phrases") {
    val rnd = new scala.util.Random(53)
    val words = Seq("table", "scan", "merge", "spark", "the")
    val rows = Seq.tabulate(300)(i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(25))(words(rnd.nextInt(words.size))).mkString(" ")))
    for (p <- Seq("table scan", "the table scan", "spark spark", "merge the merge"))
      assert(phrase(rows, p) == bruteCounts(rows, p), s"phrase '$p'")
  }

  test("C134: overlapping occurrences and duplicate phrase terms count correctly") {
    val rows = Seq((1L, "a a a a"), (2L, "a b a b a"), (3L, "b b"))
    assert(phrase(rows, "a a") == Map(1L -> 3L))
    assert(phrase(rows, "a b a") == Map(2L -> 2L))
    assert(bruteCounts(rows, "a a") == Map(1L -> 3L))
    assert(bruteCounts(rows, "a b a") == Map(2L -> 2L))
  }

  test("C134: adjacency and order are required — scattered words do not match") {
    val rows = Seq((1L, "table x scan"), (2L, "scan table"), (3L, "table scan"))
    assert(phrase(rows, "table scan") == Map(3L -> 1L))
  }

  test("C132: rrfFuse matches the hand-computed reciprocal-rank sum; consensus wins") {
    // source A ranks docs 1,2,3; source B ranks 3,2,9 — doc 2 and 3 are
    // in both, doc 2 at (2,2), doc 3 at (3,1)
    val a = Seq((1, 1L, 1L), (1, 2L, 2L), (1, 3L, 3L)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1, 3L, 1L), (1, 2L, 2L), (1, 9L, 3L)).toDF("query_id", "doc_id", "rank")
    val got = Search.rrfFuse(Seq(a, b), k = 10)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._3 -> ((r._2, r._4, r._5))).toMap
    def rr(r: Long) = 1000000L / (60L + r)
    assert(got(3L) == ((1L, rr(3) + rr(1), 2L)), s"doc3: ${got(3L)}")
    assert(got(2L) == ((2L, rr(2) + rr(2), 2L)), s"doc2: ${got(2L)}")
    assert(got(1L)._2 == rr(1) && got(1L)._3 == 1L)
    assert(got(9L)._2 == rr(3) && got(9L)._3 == 1L)
    // consensus beats any single-source rank-1: doc 3 and 2 above doc 1
    assert(got(3L)._1 < got(1L)._1 && got(2L)._1 < got(1L)._1)
    // tie between docs 1 (rank1 in A only) and... none; check doc_id
    // tie-break via two equal singles
    val c = Seq((2, 7L, 1L)).toDF("query_id", "doc_id", "rank")
    val d = Seq((2, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val tie = Search.rrfFuse(Seq(c, d), k = 10)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(tie.map(_._3).toSeq == Seq(5L, 7L), "equal scores break by doc_id asc")
  }

  test("C126: tie-break is doc_id ascending and k bounds the output") {
    // two identical docs → identical scores, deterministic order
    val rows = Seq((10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha beta"),
      (13L, "gamma"))
    val got = Search.bm25TopK(rows.toDF("doc_id", "text"), Seq(1 -> "alpha"), k = 2)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got.map(_._3).toSeq == Seq(10L, 11L))
    assert(got(0)._4 == got(1)._4, "identical docs must tie exactly")
  }
}
