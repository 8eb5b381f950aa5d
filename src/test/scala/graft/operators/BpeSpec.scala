package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C69 — full BPE tokenizer training + encode, pinned against an
  * independent sequential reference implementation (plain Scala loops:
  * count pairs with overlaps, argmax by (count DESC, left ASC, right ASC),
  * greedy leftmost non-overlapping rewrite). */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  /** Sequential reference BPE trainer over a word-frequency map. */
  private def refTrain(wf: Map[String, Long], merges: Int)
  : (Seq[(String, String, Long, Long, Long)], Map[String, Vector[String]]) = {
    var words: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    var tokens = wf.map { case (w, f) => words(w).size * f }.sum
    val steps = Seq.newBuilder[(String, String, Long, Long, Long)]
    for (_ <- 1 to merges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      for ((w, syms) <- words; i <- 0 until syms.size - 1)
        counts((syms(i), syms(i + 1))) = counts.getOrElse((syms(i), syms(i + 1)), 0L) + wf(w)
      val ((l, r), cnt) = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }.head
      var merged = 0L
      words = words.map { case (w, syms) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); merged += wf(w); i += 2
          } else { out += syms(i); i += 1 }
        }
        w -> out.result()
      }
      tokens -= merged
      steps += ((l, r, cnt, merged, tokens))
    }
    (steps.result(), words)
  }

  test("train matches the sequential reference on the corpus, step for step") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val wf = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val (want, refWords) = refTrain(wf, merges = 6)

    val model = Bpe.train(docs, merges = 6)
    val got = model.steps.map(s =>
      (s.left, s.right, s.pairCount, s.mergedOccurrences, s.corpusTokensAfter))
    assert(got == want)

    // final symbol frame matches the reference rewrite, word by word
    val gotSyms = model.symbols.orderBy("word", "pos")
      .select("word", "sym").as[(String, String)].collect()
      .groupBy(_._1).map { case (w, a) => w -> a.map(_._2).toVector }
    assert(gotSyms == refWords)
  }

  test("greedy leftmost semantics: runs merge at even offsets, overlaps never double-merge") {
    // 'aaaa' -> (a,a) merges to aa|aa; 'aaa' -> aa|a; pair count includes overlaps
    val docs = Seq((1L, "aaaa aaa ab")).toDF("doc_id", "text")
    val m = Bpe.train(docs, merges = 1)
    val s = m.steps.head
    assert((s.left, s.right) == ("a", "a"))
    assert(s.pairCount == 5L)          // aaaa: 3 overlapping + aaa: 2
    assert(s.mergedOccurrences == 3L)  // aa|aa (2) + aa|a (1)
    assert(s.corpusTokensAfter == 6L)  // 9 initial symbols - 3 merges
    val syms = m.symbols.orderBy("word", "pos").select("word", "sym")
      .as[(String, String)].collect().toSeq
    assert(syms == Seq(("aaa", "aa"), ("aaa", "a"),
      ("aaaa", "aa"), ("aaaa", "aa"), ("ab", "a"), ("ab", "b")))
  }

  test("randomized corpora: engine matches the sequential reference on 20 seeded word sets") {
    // deterministic pseudo-random corpora stress the run-parity rewrite:
    // tiny alphabets force long same-char runs and repeated-pair ties
    for (seed <- 1 to 20) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "ab" + ("cdefg".take(rnd.nextInt(4)))
      val words = (1 to 8 + rnd.nextInt(8)).map { _ =>
        (1 to 3 + rnd.nextInt(8)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val freqs = words.map(w => w -> (1L + rnd.nextInt(5)))
      val text = freqs.flatMap { case (w, n) => Seq.fill(n.toInt)(w) }.mkString(" ")
      val docs = Seq((seed.toLong, text)).toDF("doc_id", "text")
      val wf = freqs.groupBy(_._1).map { case (w, g) => w -> g.map(_._2).sum }
      val merges = 3
      val (want, refWords) = refTrain(wf, merges)
      val model = Bpe.train(docs, merges)
      val got = model.steps.map(s =>
        (s.left, s.right, s.pairCount, s.mergedOccurrences, s.corpusTokensAfter))
      assert(got == want, s"seed $seed: trajectory diverged\n got=$got\nwant=$want")
      val gotSyms = model.symbols.orderBy("word", "pos")
        .select("word", "sym").as[(String, String)].collect()
        .groupBy(_._1).map { case (w, a) => w -> a.map(_._2).toVector }
      assert(gotSyms == refWords, s"seed $seed: final symbols diverged")
    }
  }

  test("encodeStats applies learned merges to UNSEEN words — no document is dropped") {
    val train = Seq((1L, "aaaa aaaa aaaa bb bb")).toDF("doc_id", "text")
    val model = Bpe.train(train, merges = 2) // learns (a,a) then (aa,aa) or (b,b)
    // encode corpus: one word the trainer saw, one partially covered by
    // learned merges, one with no applicable merge at all
    val enc = Seq((10L, "aaaa"), (11L, "aaac"), (12L, "xyz")).toDF("doc_id", "text")
    val got = Bpe.encodeStats(enc, model).orderBy("doc_id")
      .select("doc_id", "n_words", "n_chars", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // sequential reference: apply the merge list in order to each word
    def refApply(word: String): Int = {
      var syms = word.map(_.toString).toVector
      for (s <- model.steps) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == s.left && syms(i + 1) == s.right) {
            out += (s.left + s.right); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.size
    }
    val want = Seq(
      (10L, 1L, 4L, refApply("aaaa").toLong),
      (11L, 1L, 4L, refApply("aaac").toLong),
      (12L, 1L, 3L, refApply("xyz").toLong))
    assert(got == want, s"got $got want $want")
    assert(got.map(_._1) == Seq(10L, 11L, 12L), "every doc must appear, OOV included")
  }

  test("fertilityAudit: per-group ratios match a sequential reference, fixed-point exact") {
    val docs = Seq(
      (1L, "en", "aaaa aaaa bb cc"),
      (2L, "en", "aaaa dd"),
      (3L, "de", "aaac xyz aaaa")).toDF("doc_id", "lang", "text")
    val model = Bpe.train(docs, merges = 2)
    def refApply(word: String): Int = {
      var syms = word.map(_.toString).toVector
      for (s <- model.steps) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms(i) == s.left && syms(i + 1) == s.right) {
            out += (s.left + s.right); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms.size
    }
    val corpus = Seq(
      "en" -> Seq("aaaa", "aaaa", "bb", "cc", "aaaa", "dd"),
      "de" -> Seq("aaac", "xyz", "aaaa"))
    val want = corpus.map { case (lang, words) =>
      val nWords = words.size.toLong
      val nVocab = words.distinct.size.toLong
      val nChars = words.map(_.length.toLong).sum
      val toks = words.map(w => refApply(w).toLong)
      val nTokens = toks.sum
      val nUnsplit = toks.count(_ == 1L).toLong
      (lang, nWords, nVocab, nChars, nTokens, nUnsplit,
        nTokens * 1000000L / nWords, nChars * 1000000L / nTokens,
        nUnsplit * 1000000L / nWords)
    }.sortBy(_._1)
    val got = Bpe.fertilityAudit(docs, model).orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("encodeStats: token totals reconcile with the trajectory's final corpus count") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val model = Bpe.train(docs, merges = 6)
    val enc = Bpe.encodeStats(docs, model)
    val total = enc.agg(sum("n_tokens")).as[Long].collect()(0)
    assert(total == model.steps.last.corpusTokensAfter)
    // chars never shrink below tokens; tokens never exceed chars
    assert(enc.filter(col("n_tokens") > col("n_chars")).count() == 0)
    assert(enc.filter(col("n_tokens") < col("n_words")).count() == 0)
  }
}
