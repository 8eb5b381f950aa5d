package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("langId picks the dominant stopword profile, und when none") {
    val docs = Seq(
      (1L, "the cat and the dog is in a house of mice"),
      (2L, "der hund und die katze ist nicht mit ein vogel"),
      (3L, "le chat et la maison est dans un jardin"),
      (4L, "el perro y los gatos es un animal por que salta"),
      (5L, "的 是 在 了 我 有 他"),
      (6L, "zzz qqq www")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs).select("doc_id", "pred_lang")
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "zh", 6L -> "und"))
  }

  test("quality features match hand computation") {
    val df = Seq((1L, "the cat ate the fish")).toDF("doc_id", "text")
    val feats = TextAnalysis.qualityFeatures(col("text"))
    val row = df.select(feats.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(row.getAs[Long]("n_chars_m") == 20L)
    assert(row.getAs[Long]("n_words") == 5L)
    assert(row.getAs[Double]("avg_word_len") == 16.0 / 5)   // 16 letters / 5 words
    assert(row.getAs[Double]("stopword_ratio") == 2.0 / 5)  // two "the"
  }

  test("token counts: whitespace vs BPE-ish segmentation") {
    val df = Seq((1L, "ab 12 cd!")).toDF("doc_id", "text")
    val counts = TextAnalysis.tokenCounts(col("text"))
    val row = df.select(counts.map { case (n, c) => c.as(n) }: _*).collect()(0)
    assert(row.getAs[Long]("ws_tokens") == 3L)
    assert(row.getAs[Long]("bpe_tokens") == 4L) // ab | 12 | cd | !
  }

  test("piiRedact scrubs planted emails/SSNs/phones and counts them") {
    val df = Seq(
      (1L, "contact bob@example.com or +1 (555) 123-4567 now"),
      (2L, "ssn 123-45-6789 leaked twice 987-65-4321"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val cols = TextAnalysis.piiRedact(col("text"))
    val rows = df.select(col("doc_id") +: cols.map { case (n, c) => c.as(n) }: _*)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows(0)._2 == "contact <EMAIL> or <PHONE> now")
    assert((rows(0)._3, rows(0)._4, rows(0)._5) == ((1L, 0L, 1L)))
    assert(rows(1)._2 == "ssn <SSN> leaked twice <SSN>")
    assert((rows(1)._3, rows(1)._4, rows(1)._5) == ((0L, 2L, 0L)))
    assert(rows(2)._2 == "nothing sensitive here")
  }

  test("hashSplit is deterministic and roughly 80/10/10") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val counts = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000L)
    assert(counts("train") > 1400 && counts("train") < 1800, s"train=$counts")
    assert(counts("val") > 100 && counts("val") < 350)
    assert(counts("test") > 100 && counts("test") < 350)
    val again = Sampling.hashSplit(docs, "doc_id")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again == counts, "same input ⇒ identical assignment")
  }

  test("tfidfTopK ranks a doc-distinctive term above corpus-wide terms") {
    val docs = Seq(
      (1L, "common common zebra"),
      (2L, "common common common"),
      (3L, "common word word")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopK(docs, k = 1)
      .select("id", "term").as[(Long, String)].collect().toMap
    assert(top(1L) == "zebra", "df=1 term dominates despite tf=1")
    assert(top(3L) == "word")
  }

  test("repetitionProfile: hand-computed totals on a repeating doc") {
    val docs = Seq(
      (1L, "a b a b a b"),        // trigrams: aba, bab, aba, bab
      (2L, "w x y z"),            // trigrams: wxy, xyz — all distinct
      (3L, "q")                   // short doc: one whole-text shingle
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionProfile(docs, n = 3)
      .select("doc_id", "total_ngrams", "distinct_ngrams", "max_repeat", "dup_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 2L, 2L, 0.5)), s"got ${got(1L)}")
    assert(got(2L) == ((2L, 2L, 2L, 1L, 0.0)), s"got ${got(2L)}")
    assert(got(3L) == ((3L, 1L, 1L, 1L, 0.0)), s"got ${got(3L)}")
  }

  test("fingerprint is deterministic, order-sensitive, and non-negative") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), (3L, "gamma beta alpha")
    ).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) == fps(2L), "same text ⇒ same fingerprint")
    assert(fps(1L) != fps(3L), "reorder ⇒ different fingerprint")
    assert(fps.values.forall(_ >= 0))
  }

  test("native rolling_hash kernel == the HOF fold it replaced, both modes") {
    val M = 562949953421231L
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, ""), (3L, "solo"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    // the r2 interpreted formulations, kept here as the executable spec
    // of the fold the native kernel must reproduce exactly
    val hofXx = aggregate(split(col("text"), " "), lit(0L),
      (acc, t) => pmod(acc * 31 + pmod(xxhash64(t), lit(M)), lit(M)))
    val hofMd5 = aggregate(split(col("text"), " "), lit(0L),
      (acc, t) => pmod(acc * 31 + graft.operators.Dedup.portableHash31(t), lit(M)))
    val rows = docs.select(
      TextAnalysis.fingerprint(col("text")).as("native_xx"), hofXx.as("hof_xx"),
      TextAnalysis.fingerprintPortable(col("text")).as("native_md5"), hofMd5.as("hof_md5"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("native_xx") == r.getAs[Long]("hof_xx"))
      assert(r.getAs[Long]("native_md5") == r.getAs[Long]("hof_md5"))
    }
  }

  test("canonicalize: NFC composition, case, and whitespace variants collapse to one form") {
    val variants = Seq(
      (1L, "Café au  lait"),          // precomposed é, double space
      (2L, "café au lait"),          // e + combining acute (NFD form)
      (3L, "  café\tau\nlait "),      // tabs/newlines/edges
      (4L, "completely different"))
      .toDF("doc_id", "text")
    val forms = variants
      .select(col("doc_id"), TextAnalysis.canonicalize(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(forms(1L) == "café au lait")
    assert(forms(1L) == forms(2L), "NFC must unify composed and decomposed accents")
    assert(forms(1L) == forms(3L), "whitespace runs and edges must collapse")
    assert(forms(4L) != forms(1L))
  }

  test("canonicalDedup: variant docs map to one canonical id; clean docs stay distinct") {
    val docs = Seq(
      (10L, "The  Quick Brown Fox"), (11L, "the quick brown fox"),
      (12L, "the quick\tbrown fox"), (20L, "an unrelated document"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.canonicalDedup(docs)
      .select("doc_id", "canonical_id", "n_copies")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L), (20L, 20L, 1L)))
  }

  test("rarityScore: integer-exact inverse-frequency sums, hand-checked") {
    // corpus counts: common ×4, mid ×2, rare ×1
    val docs = Seq(
      (1L, "common common mid"), (2L, "common mid rare"), (3L, "common"))
      .toDF("doc_id", "text")
    val S = 1000000000L
    val got = TextAnalysis.rarityScore(docs)
      .select("doc_id", "n_tokens", "rarity_sum", "rarity_avg")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val common = S / 4; val mid = S / 2; val rare = S
    assert(got.toSeq == Seq(
      (1L, 3L, common * 2 + mid, (common * 2 + mid) / 3),
      (2L, 3L, common + mid + rare, (common + mid + rare) / 3),
      (3L, 1L, common, common)))
  }

  test("invertedIndex: df/tf exact, postings numerically ordered, head terms capped") {
    val docs = Seq(
      (2L, "alpha alpha beta"),   // alpha tf=2 here, df counts it once
      (10L, "alpha beta"),
      (1L, "alpha gamma"),
      (3L, "solo"))               // df=1 → dropped by minDf=2
      .toDF("doc_id", "text")
    val got = TextAnalysis.invertedIndex(docs, minDf = 2, postingsCap = 2)
      .select("term", "df", "total_tf", "postings")
      .as[(String, Long, Long, Option[String])].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      // df=3 > cap → postings NULL, stats still exact
      ("alpha", 3L, 4L, None),
      // ids sorted numerically: 2,10 (lexicographic would be "10,2")
      ("beta", 2L, 2L, Some("2,10"))))
  }

  test("oov rate: counts tokens outside the vocab, denominates by doc length") {
    val docs = Seq((0L, "a b a z"), (1L, "a a"), (2L, "q r s")).toDF("doc_id", "text")
    val vocab = Seq("a", "b").toDF("term")
    val out = TextAnalysis.oovRate(docs, vocab)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((0L, 4L, 1L, 0.25), (1L, 2L, 0L, 0.0), (2L, 3L, 3L, 1.0)))
  }

  test("filter funnel: first-kill attribution, per-stage in/killed/out, zero-kill stages") {
    val docs = Seq(
      (0L, 10L, "keep"),  // survives both
      (1L, 3L, "keep"),   // killed by min_len
      (2L, 3L, "drop"),   // fails BOTH → attributed to the FIRST (tag_keep)
      (3L, 20L, "drop")   // killed by tag_keep
    ).toDF("id", "len", "tag")
    val out = TextAnalysis.filterFunnel(docs, Seq(
      "tag_keep" -> (col("tag") === "keep"),
      "min_len"  -> (col("len") >= 5L),
      "noop"     -> lit(true)))
      .select("stage", "filter", "n_in", "n_killed", "n_out")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "tag_keep", 4L, 2L, 2L),
      (2L, "min_len", 2L, 1L, 1L),
      (3L, "noop", 1L, 0L, 1L)))
  }

  test("filter funnel: a NULL predicate kills (treated as failing), like a real pipeline") {
    val docs = Seq((0L, Some(10L)), (1L, Option.empty[Long])).toDF("id", "len")
    val out = TextAnalysis.filterFunnel(docs, Seq("min_len" -> (col("len") >= 5L)))
      .select("n_in", "n_killed", "n_out").as[(Long, Long, Long)].head()
    assert(out == ((2L, 1L, 1L)))
  }

  test("datasetCard: volume, dup rate, language mix per source, hand-computed") {
    val docs = Seq(
      (1L, "same text", "en", "web", 9L),
      (2L, "same text", "en", "web", 9L),   // exact dup of 1
      (3L, "other words", "de", "web", 11L),
      (4L, "solo doc", "en", "books", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextAnalysis.datasetCard(docs).orderBy("source")
      .as[(String, Long, Long, Long, Long, Double, Long, String, Double)]
      .collect().toSeq
    assert(out == Seq(
      ("books", 1L, 2L, 8L, 1L, 0.0, 1L, "en", 1.0),
      ("web", 3L, 6L, 29L, 2L, 1.0 / 3, 2L, "en", 2.0 / 3)))
  }

  test("importanceWeights: smoothed integer ratios, hand-computed") {
    val docs = Seq(
      (1L, "en", "hello world"),       // target
      (2L, "de", "hallo world"),       // corpus only
      (3L, "en", "hello hello")        // target
    ).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.importanceWeights(docs, col("lang") === "en", scale = 1000L)
      .select("doc_id", "n_tokens", "weight_sum", "importance")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // vocab: hello nc=3 nt=3 -> w=1000*4/4=1000; world nc=2 nt=1 -> 1000*2/3=666
    // hallo nc=1 nt=0 -> 1000*1/2=500
    assert(out(1L) == ((1L, 2L, 1666L, 833L)))
    assert(out(2L) == ((2L, 2L, 1166L, 583L)))
    assert(out(3L) == ((3L, 2L, 2000L, 1000L)))
  }

  test("bpePairCounts: adjacent pairs with multiplicity, frequency-ranked, ties by pair") {
    val docs = Seq(
      (1L, "a b a b c"),   // pairs: (a,b) (b,a) (a,b) (b,c)
      (2L, "a b"),         // (a,b)
      (3L, "x"),           // single token: no pairs
      (4L, "b c")          // (b,c)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCounts(docs, topK = 10)
      .as[(String, String, Long)].collect().toSeq
    assert(out == Seq(("a", "b", 3L), ("b", "c", 2L), ("b", "a", 1L)))
  }

  test("lmScore: stupid-backoff fixed-point matches hand-computed train counts") {
    import spark.implicits._
    // train slice (en): c(a)=3, c(b)=3, c(c)=1, T=7;
    // train bigrams: cb(a,b)=3, cb(b,a)=1, cb(b,c)=1; S=1e9
    val docs = Seq(
      (1L, "a b a b", "en"),
      (2L, "a b c", "en"),
      (3L, "b a x", "xx"), // (a,x) unseen, c(x)=0 → score 0
      (4L, "q", "xx"),     // single token: no bigrams, lm_avg null
      (5L, "c c", "xx")    // (c,c) unseen, backoff on c(c)=1
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.lmScore(docs, isTrain = col("lang") === "en")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    val sAB = 1000000000L            // 3S div 3
    val sBA = 1000000000L / 3        // S div 3 = 333333333
    val sBC = 1000000000L / 3
    val sCC = 4000000000L * 1 / 70   // 0.4·S·c(c) div T = 57142857
    assert(out(0) == (1L, 4L, 3L, sAB + sBA + sAB, Some((sAB + sBA + sAB) / 3)))
    assert(out(1) == (2L, 3L, 2L, sAB + sBC, Some((sAB + sBC) / 2)))
    assert(out(2) == (3L, 3L, 2L, sBA + 0L, Some(sBA / 2)))
    assert(out(3) == (4L, 1L, 0L, 0L, None))
    assert(out(4) == (5L, 2L, 1L, sCC, Some(sCC)))
  }

  test("qualityClassifier: distributed LMS training equals the exact integer reference") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "a dog and a bone", true),
      (3L, "der hund und die katze", false),
      (4L, "le chat est sur le tapis", false),
      (5L, "the quick brown fox", true),
      (6L, "el perro y el gato", false),
      (7L, "", true) // empty text: one "" token + bias
    )
    val df = docs.map { case (id, t, y) => (id, t, if (y) "en" else "xx") }
      .toDF("doc_id", "text", "lang")
    val (dims, iters, scale, etaDen) = (16, 4, 1000000L, 4L)
    val got = TextAnalysis.qualityClassifier(df, col("lang") === "en",
        dims, iters, scale, etaDen)
      .orderBy("doc_id")
      .select("doc_id", "label", "n_feats", "score", "predicted")
      .as[(Long, Boolean, Long, Long, Boolean)].collect().toSeq

    // exact in-memory reference of the SAME integer algorithm
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.take(15), 16) % dims).toInt
    }
    val feats: Map[Long, Set[Int]] = docs.map { case (id, t, _) =>
      id -> (t.split(" ", -1).map(bucket).toSet + dims)
    }.toMap
    val ys: Map[Long, Long] = docs.map { case (id, _, y) =>
      id -> (if (y) scale else 0L) }.toMap
    val n = docs.size.toLong
    var w = Array.fill(dims + 1)(BigInt(0))
    for (_ <- 0 until iters) {
      // NB: iterate the Set, don't `fs.map(w)` — mapping a Set collapses
      // buckets whose weights happen to be equal before the sum.
      val resid: Map[Long, BigInt] = feats.map { case (id, fs) =>
        id -> (BigInt(ys(id)) - fs.toSeq.map(w).sum) }
      val next = w.clone()
      (0 to dims).foreach { b =>
        val g = feats.collect { case (id, fs) if fs(b) => resid(id) }.sum
        next(b) = next(b) + g / BigInt(etaDen * n)
      }
      w = next
    }
    val want = docs.map { case (id, t, y) =>
      val score = feats(id).toSeq.map(w).sum.toLong
      (id, y, feats(id).size - 1L, score, 2 * score > scale)
    }
    assert(got == want, s"trajectory diverged:\n got=$got\nwant=$want")
  }

  test("qualityClassifier: learns to separate disjoint vocabularies") {
    import spark.implicits._
    // 40 docs: positives speak tokens pA/pB, negatives nA/nB — disjoint
    val df = (0L until 40L).map { i =>
      val pos = i % 2 == 0
      (i, if (pos) "pA pB pA" else "nA nB nA", if (pos) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
    val out = TextAnalysis.qualityClassifier(df, col("lang") === "en")
      .select("label", "score").as[(Boolean, Long)].collect()
    val posMin = out.filter(_._1).map(_._2).min
    val negMax = out.filterNot(_._1).map(_._2).max
    assert(posMin > negMax,
      s"positive scores must strictly dominate: posMin=$posMin negMax=$negMax")
    // determinism: batch gradients are associative sums — rerun is identical
    val again = TextAnalysis.qualityClassifier(df, col("lang") === "en")
      .select("label", "score").as[(Boolean, Long)].collect()
    assert(out.sortBy(_._2).toSeq == again.sortBy(_._2).toSeq)
  }

  test("calibrationSweep: confusion counts and fixed-point metrics match by hand") {
    import spark.implicits._
    // scores: pos {90, 60, 30}, neg {70, 20}; thresholds 25/50/75
    val scored = Seq((true, 90L), (true, 60L), (true, 30L), (false, 70L), (false, 20L))
      .toDF("label", "score")
    val out = TextAnalysis.calibrationSweep(scored, Seq(25L, 50L, 75L), scale = 100L)
      .orderBy("threshold_idx")
      .select("threshold_idx", "threshold", "tp", "fp", "fn", "tn",
        "precision_fp", "recall_fp", "f1_fp")
      .as[(Int, Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(out == Seq(
      // t=25: tp=3 fp=1 fn=0 tn=1  p=75 r=100  f1=2*75*100/175=85
      (1, 25L, 3L, 1L, 0L, 1L, Some(75L), Some(100L), Some(85L)),
      // t=50: tp=2 fp=1 fn=1 tn=1  p=66 r=66   f1=66
      (2, 50L, 2L, 1L, 1L, 1L, Some(66L), Some(66L), Some(66L)),
      // t=75: tp=1 fp=0 fn=2 tn=2  p=100 r=33  f1=2*100*33/133=49
      (3, 75L, 1L, 0L, 2L, 2L, Some(100L), Some(33L), Some(49L))))
  }

  test("calibrationSweep: empty denominators go NULL, never divide") {
    import spark.implicits._
    val allNeg = Seq((false, 10L), (false, 90L)).toDF("label", "score")
    val out = TextAnalysis.calibrationSweep(allNeg, Seq(50L, 200L), scale = 100L)
      .orderBy("threshold_idx")
      .select("tp", "fp", "precision_fp", "recall_fp", "f1_fp")
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])].collect().toSeq
    assert(out == Seq(
      (0L, 1L, Some(0L), None, None),  // recall undefined: no positives exist
      (0L, 0L, None, None, None)))     // threshold above every score: no predictions
  }

  test("bpePairCounts plan: no window, no lambda, pair agg is partial, top-k is TakeOrdered") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val p = TextAnalysis.bpePairCounts(docs, topK = 5)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    assert(!p.toLowerCase.contains("lambdafunction"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_"), p)
  }

  test("codeSwitchProfile: segment votes, majority tie-break, und handling — by hand") {
    val en = ("the a " * 10).trim                      // one 20-token 'en' segment
    val de = ("der die das und ist nicht mit ein zu den " * 2).trim // one 'de' segment
    val docs = Seq(
      (1L, s"$en $de"),        // en + de: tie 1-1 → lexicographically larger wins
      (2L, "xx qq kk"),        // single und segment (no profile stopwords)
      (3L, s"$en $en $de")     // 2 en + 1 de: majority en 2/3
    ).toDF("doc_id", "text")
    val got = TextAnalysis.codeSwitchProfile(docs, width = 20).orderBy("doc_id")
      .select("doc_id", "n_segments", "n_lang_segments", "n_langs",
        "majority_lang", "majority_cnt", "majority_share_fp", "code_switched")
      .as[(Long, Long, Long, Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 2L, "en", 1L, 500000L, true),
      (2L, 1L, 0L, 0L, "und", 1L, 1000000L, false),
      (3L, 3L, 3L, 2L, "en", 2L, 666666L, true)), s"got $got")
  }

  test("scoreCalibration: two-level rank equals the global window; cut keeps top 30% per domain") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val got = TextAnalysis.scoreCalibration(docs, keepPct = 30)
    val wGlobal = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    assert(got.withColumn("grank", row_number().over(wGlobal).cast("long"))
      .filter(col("rank") =!= col("grank")).count() == 0,
      "two-level rank diverged from the global per-source window")
    // the cut is domain-calibrated: each source keeps ~keepPct% of itself
    val shares = got.groupBy("source")
      .agg((sum(when(col("keep_top"), 1L).otherwise(0L)) * 100.0 / count(lit(1))).as("pct"))
      .select("pct").as[Double].collect()
    assert(shares.nonEmpty && shares.forall(p => p >= 25.0 && p <= 35.0),
      s"every domain must keep ~30% of ITSELF (got ${shares.toSeq})")
  }

  test("mojibakeProfile repairs a REAL windows-1252 double-encoding back to the original") {
    def mangle(s: String): String = new String(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8), "windows-1252")
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val clean1 = "the café – a naïve “quote” he didn’t close"
    val clean2 = "señor Gaël über naïveté"  // è is in the table too? ë is NOT
    val plain = "perfectly ordinary ascii text"
    val docs = Seq(
      (1L, mangle(clean1)), (2L, mangle(clean2)), (3L, plain)
    ).toDF("doc_id", "text")
    val got = TextAnalysis.mojibakeProfile(docs).orderBy("doc_id")
      .select("doc_id", "n_latin1_seq", "n_punct_seq", "is_mojibake", "repaired_hash")
      .as[(Long, Long, Long, Boolean, String)].collect().toSeq
    // clean1: é, ï → latin1 (2); –, “, ’ → punct (3); ” (U+201D) is NOT in
    // the fix table (its W1252 mangle hits undefined byte 0x9D), so the
    // repair covers table entries only — count what the table covers.
    assert(got(0)._2 == 2 && got(0)._3 == 3 && got(0)._4, s"${got(0)}")
    // every table-covered char round-trips: repair(mangle(x)) == x for a
    // string built ONLY from covered chars + ascii
    val covered = "café naïve don’t “quote– ñ ü è"
    val rt = TextAnalysis.mojibakeProfile(
        Seq((9L, mangle(covered))).toDF("doc_id", "text"))
      .select("repaired_hash").as[String].collect().head
    assert(rt == md5hex(covered), "charset round-trip must restore the original")
    // ascii doc: untouched, not flagged, hash of the original
    assert(got(2) == ((3L, 0L, 0L, false, md5hex(plain))), s"${got(2)}")
  }

  test("C87: n-gram novelty scores planted overlap exactly") {
    // ref doc 0 holds tokens a..j; current docs copy spans of it
    val ref = (0 to 9).map(i => ('a' + i).toChar.toString).mkString(" ")
    val df = Seq(
      (0L, ref),                                 // reference
      (1L, ref),                                 // exact copy → novelty 0
      (3L, "a b c x y z w q r s t u v"),         // shares only 3-gram "a b c"… but n=3 grams overlap just 1
      (5L, "p1 p2 p3 p4 p5")                     // fully novel
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(df, isRef = col("doc_id") % 2 === 0, n = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // doc 1: 8 grams, all in ref → 0 novel
    assert(got.find(_._1 == 1L).get == ((1L, 8L, 0L, 0L)))
    // doc 3: 11 grams ("a b c" .. "t u v"), exactly one ("a b c") in ref
    val d3 = got.find(_._1 == 3L).get
    assert(d3._2 == 11L && d3._3 == 10L && d3._4 == 10L * 1000 / 11L, s"$d3")
    // doc 5: 3 grams, none in ref → 1000 per-mille
    assert(got.find(_._1 == 5L).get == ((5L, 3L, 3L, 1000L)))
    // reference docs never appear in the output
    assert(got.map(_._1) == Seq(1L, 3L, 5L))
  }

  // ------------------------------------------------- C152 cooccurrence lift

  /** Brute replay: unordered within-window pairs, exact BigInt lift. */
  private def refLift(texts: Seq[String], w: Int, minPair: Long): Map[(String, String), (Long, Long, Long, Long)] = {
    val toks = texts.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val totT = toks.map(_.size).sum.toLong
    val pairs = toks.flatMap { tk =>
      for {
        i <- tk.indices; d <- 1 to w if i + d < tk.size
        if tk(i) != tk(i + d)
      } yield if (tk(i) < tk(i + d)) (tk(i), tk(i + d)) else (tk(i + d), tk(i))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minPair)
    val totP = pairs.values.sum
    pairs.map { case ((a, b), nab) =>
      val lift = (BigInt(1000000) * nab * totT * totT /
        (BigInt(totP) * uni(a) * uni(b))).toLong
      (a, b) -> ((nab, uni(a), uni(b), lift))
    }
  }

  test("C152: co-occurrence lift equals the brute replay; collocations outrank chance pairs") {
    // 'rock roll' always adjacent (collocation); 'the' is everywhere
    // (no lift); 'salt pepper' co-occur at distance 4 (inside w=5)
    val texts = Seq.tabulate(20) { i =>
      s"the rock roll band n$i played the salt of all pepper songs the end"
    }
    val got = TextAnalysis.cooccurrenceLift(
        texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text"),
        window = 5, minPair = 5L, topK = 1000)
      .as[(String, String, Long, Long, Long, Long)].collect()
    val want = refLift(texts, 5, 5L)
    assert(got.length == want.size, s"${got.length} vs ${want.size}")
    for (g <- got)
      assert(want((g._1, g._2)) == ((g._3, g._4, g._5, g._6)), s"pair $g")
    val byPair = got.map(g => (g._1, g._2) -> g._6).toMap
    // the exclusive pair must outrank the ubiquitous-token pair
    assert(byPair(("rock", "roll")) > byPair(("end", "the")),
      s"collocation must beat chance: $byPair")
    // distance-4 co-occurrence is captured by the window
    assert(byPair.contains(("pepper", "salt")))
    // ranking is lift DESC with pair ties ASC
    assert(got.sortBy(g => (-g._6, g._1, g._2)).toSeq == got.toSeq)
  }

  test("C153: TextRank ranks the hub token above peripherals; deterministic") {
    // star-shaped co-occurrence: 'core' co-occurs with every spoke, the
    // spokes only with 'core' — PageRank must put the hub on top
    val texts = (1 to 12).map(i => (i.toLong, s"core spoke$i core spoke$i"))
    val got = TextAnalysis.textRankKeywords(texts.toDF("doc_id", "text"),
        window = 3, minCount = 2L, topK = 5)
      .as[(String, Long)].collect()
    assert(got.head._1 == "core", s"hub must rank first: ${got.toSeq}")
    assert(got.head._2 > got(1)._2 * 3, "hub rank dominates the spokes")
    // spokes are symmetric: identical ranks, token-ASC tie order
    val spokes = got.drop(1)
    assert(spokes.map(_._2).distinct.length == 1, s"spokes tie: ${spokes.toSeq}")
    assert(spokes.map(_._1).toSeq == spokes.map(_._1).toSeq.sorted)
    val again = TextAnalysis.textRankKeywords(texts.toDF("doc_id", "text"),
        window = 3, minCount = 2L, topK = 5).as[(String, Long)].collect()
    assert(got.toSeq == again.toSeq)
  }

  test("C159: ROUGE-N equals the clipped brute force; repetition cannot farm matches") {
    def brute(cand: String, ref: String, n: Int): (Long, Long, Long) = {
      def grams(s: String) = s.split(" ").toSeq.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq
      val (cg, rg) = (grams(cand), grams(ref))
      val rc = rg.groupBy(identity).view.mapValues(_.size).toMap
      val m = cg.groupBy(identity).map { case (g, os) =>
        math.min(os.size, rc.getOrElse(g, 0)) }.sum.toLong
      (m, cg.size.toLong, rg.size.toLong)
    }
    val pairs = Seq(
      (1L, "the cat sat on the mat", "the cat lay on the mat"),
      // candidate repeats 'the the the' — clipping caps matches at the
      // reference's count
      (2L, "the the the the", "the end"),
      (3L, "exact copy here", "exact copy here"),
      (4L, "completely different words", "nothing shared at all"),
      (5L, "x", "x y z"))  // 1 token: no bigrams on the candidate side
    for (n <- Seq(1, 2)) {
      val got = TextAnalysis.rougeN(pairs.toDF("pair_id", "cand", "ref"), n)
        .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
        .collect().map(r => r._1 -> r).toMap
      for ((id, c, r) <- pairs) {
        val (m, nc, nr) = brute(c, r, n)
        val g = got(id)
        assert((g._2, g._3, g._4) == ((m, nc, nr)), s"n=$n pair $id: $g vs ($m, $nc, $nr)")
        assert(g._5 == (if (nc > 0) Some(1000000L * m / nc) else None))
        assert(g._6 == (if (nr > 0) Some(1000000L * m / nr) else None))
        assert(g._7 == (if (nc + nr > 0) Some(2000000L * m / (nc + nr)) else None))
      }
    }
    // semantics anchors: identical pair scores a perfect 10^6 at both n;
    // disjoint pair scores 0; clipping holds the repeated-'the' pair to 1
    val g1 = TextAnalysis.rougeN(pairs.toDF("pair_id", "cand", "ref"), 1)
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(g1(3L)._7 == Some(1000000L) && g1(4L)._2 == 0L)
    assert(g1(2L)._2 == 1L, "clipped: four 'the's match at most the reference's one")
  }

  test("C152: window bounds respected; short docs never crash") {
    val texts = Seq((1L, "a b c d e f g h"), (2L, "x"), (3L, ""), (4L, "p q"))
    val got = TextAnalysis.cooccurrenceLift(texts.toDF("doc_id", "text"),
        window = 2, minPair = 1L, topK = 1000)
      .as[(String, String, Long, Long, Long, Long)].collect()
    // distance-3 pairs (a,d) must NOT appear under w=2
    assert(!got.exists(g => g._1 == "a" && g._2 == "d"))
    assert(got.exists(g => g._1 == "a" && g._2 == "c"), "distance-2 pair present")
    assert(got.exists(g => g._1 == "p" && g._2 == "q"), "2-token doc pairs")
  }
}
