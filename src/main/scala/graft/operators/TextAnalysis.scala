package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.tokens

/**
 * §2C text-analysis family — language ID, quality scoring, token counting,
 * document fingerprinting. Pure per-row column expressions: zero shuffle,
 * fully codegen'd, so at 100 TB these run at scan speed and pipeline into
 * whatever filter/agg follows.
 */
object TextAnalysis {

  /** Per-language stopword profiles for the n-gram/stopword heuristic. */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "was", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "en", "que", "por"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "他", "这", "不", "人")
  )

  /** The classic UTF-8-read-as-Windows-1252 confusable table (the core
    * trick table of encoding-repair tools like ftfy): each pair maps the
    * MANGLED character sequence a double-encoding produces back to the
    * intended character. Longest sequences first, so the 3-byte
    * punctuation fixes never leave a dangling "â€" for a later rule.
    * Each (bad, good) is a plain literal — substitution is chained
    * `replace`, identical on any engine, no regex dialect in play. */
  val MojibakeFixes: Seq[(String, String)] = Seq(
    "â€™" -> "’", // â€™  → ’  (E2 80 99)
    "â€œ" -> "“", // â€œ  → “  (E2 80 9C)
    "â€“" -> "–", // â€“  → –  (E2 80 93)
    "Ã©" -> "é",       // Ã©   → é  (C3 A9)
    "Ã¨" -> "è",       // Ã¨   → è  (C3 A8)
    "Ã¯" -> "ï",       // Ã¯   → ï  (C3 AF)
    "Ã¼" -> "ü",       // Ã¼   → ü  (C3 BC)
    "Ã±" -> "ñ")       // Ã±   → ñ  (C3 B1)

  /** C76: ENCODING-ANOMALY (mojibake) detection + repair — the ftfy step
    * of web-corpus cleaning: text that went UTF-8 → bytes → Windows-1252
    * → UTF-8 carries telltale "Ã©"/"â€™" sequences; this profiles each
    * document (occurrence counts of the Latin-1 and punctuation mangle
    * classes) and applies the inverse mapping. Everything is literal
    * `replace`/`length`/`md5` arithmetic — no regex, so any replaying
    * engine agrees exactly; occurrence counts use the
    * (len − len(removed)) / len(seq) identity.
    *
    * Scale: pure per-row column expressions — zero shuffle, codegen'd,
    * scan-speed; the fix table is a compile-time constant chain.
    *
    * Output: (doc_id, n_latin1_seq, n_punct_seq, is_mojibake,
    * n_chars_before, n_chars_after, repaired_hash). */
  def mojibakeProfile(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // literal (non-regex) replace — Spark's codegen'd StringReplace
    def rep(c: Column, bad: String, good: String): Column =
      call_function("replace", c, lit(bad), lit(good))
    def occurrences(seq: String): Column =
      (length(t) - length(rep(t, seq, ""))) / seq.length
    val repaired = MojibakeFixes.foldLeft(t) { case (c, (bad, good)) =>
      rep(c, bad, good)
    }
    val latin1 = MojibakeFixes.filter(_._1.length == 2)
    val punct = MojibakeFixes.filter(_._1.length == 3)
    docs.select(col(idCol),
      latin1.map(f => occurrences(f._1)).reduce(_ + _).cast("long").as("n_latin1_seq"),
      punct.map(f => occurrences(f._1)).reduce(_ + _).cast("long").as("n_punct_seq"),
      length(t).cast("long").as("n_chars_before"),
      length(repaired).cast("long").as("n_chars_after"),
      md5(repaired).as("repaired_hash"))
    .withColumn("is_mojibake", col("n_chars_after") < col("n_chars_before"))
  }

  /** C8: language ID — frequency-weighted stopword-hit score per language,
    * argmax wins (ties broken by profile order), floor of 0 hits → "und"
    * (undetermined). A real system would add char n-gram profiles; the
    * operator shape (score columns → greatest → case) is the same. */
  def langId(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val toks = tokens(col(textCol))
    val langs = StopwordProfiles.keys.toSeq.sorted
    def score(lang: String): Column =
      size(filter(toks, t => t.isInCollection(StopwordProfiles(lang)))).cast("long")
    val scored = docs.select(
      col(idCol) +: langs.map(l => score(l).as(s"score_$l")): _*)
    val best = greatest(langs.map(l => col(s"score_$l")): _*)
    val pred = langs.foldRight(lit("und")) { (l, acc) =>
      when(col(s"score_$l") === best && best > 0, l).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** Language prediction as ONE column expression — the per-row form of
    * langId for single-pass pipelines (same profiles, same argmax and
    * tie-break order, 0 hits → "und"). */
  def predLang(text: Column): Column = {
    val toks = tokens(text)
    val scores = StopwordProfiles.keys.toSeq.sorted.map(l =>
      l -> size(filter(toks, t => t.isInCollection(StopwordProfiles(l)))).cast("long"))
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, l).otherwise(acc)
    }
  }

  /** C78: CODE-SWITCHING (mixed-language) detection — the segment-level
    * refinement of C8's whole-document language ID: a document that reads
    * 'en' overall can still interleave other-language blocks (forum
    * quotes, boilerplate, spam keyword stuffing), and mixed-language text
    * is a standard drop/route signal in monolingual corpus curation.
    * Each document is cut into fixed `width`-token segments
    * ([[Chunking.tokenLines]] — closed-form, no HOF), each segment gets
    * the C8 language vote, and the per-doc profile reports segment
    * counts, the distinct identified languages, the majority language
    * (struct-max argmax, C51's tie-break: ties pick the
    * lexicographically larger language) and its fixed-point share.
    *
    * Scale: one scan + output-proportional segment explode; the decision
    * frame is (doc, lang) pairs — ≤ profile-count rows per doc. */
  def codeSwitchProfile(docs: DataFrame, width: Int = 20,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val lines = Chunking.tokenLines(docs.select(col(idCol), col(textCol)),
      width, idCol, textCol)
    val per = lines.select(col(idCol), predLang(col("line")).as("seg_lang"))
      .groupBy(idCol, "seg_lang").agg(count(lit(1)).as("cnt"))
    per.groupBy(idCol).agg(
        sum(col("cnt")).as("n_segments"),
        sum(when(col("seg_lang") =!= "und", col("cnt")).otherwise(0L))
          .as("n_lang_segments"),
        countDistinct(when(col("seg_lang") =!= "und", col("seg_lang")))
          .as("n_langs"),
        max(struct(col("cnt"), col("seg_lang"))).getField("seg_lang")
          .as("majority_lang"),
        max(struct(col("cnt"), col("seg_lang"))).getField("cnt")
          .as("majority_cnt"))
      .withColumn("majority_share_fp",
        expr("majority_cnt * 1000000 div n_segments"))
      .withColumn("code_switched", col("n_langs") >= 2)
  }

  /** C9 building block: quality features from portable string ops (replace/
    * length only — semantics identical in Spark and DuckDB so the oracle
    * can recompute them). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("long")
    val nSpaces = (length(text) - length(regexp_replace(text, " ", ""))).cast("long")
    val nWords = nSpaces + 1
    val alphaLen = len - nSpaces
    val avgWordLen = alphaLen.cast("double") / nWords
    val stopHits = ((length(text) - length(regexp_replace(text, "the", ""))) / 3 +
                    (length(text) - length(regexp_replace(text, " a ", ""))) / 3).cast("long")
    val stopRatio = stopHits.cast("double") / nWords
    val score = least(lit(1.0), nWords.cast("double") / 100) * 0.5 +
      least(lit(1.0), avgWordLen / 8) * 0.3 + least(lit(1.0), stopRatio * 5) * 0.2
    Seq("n_chars_m" -> len, "n_words" -> nWords, "avg_word_len" -> avgWordLen,
        "stopword_ratio" -> stopRatio, "quality_score" -> score)
  }

  /** C77: per-DOMAIN score CALIBRATION — rank-normalize the quality score
    * within each domain so one global percentile threshold means the same
    * thing on every source (the per-domain-cut practice of web-corpus
    * filtering: an absolute score threshold keeps 80% of one site and 2%
    * of another because score DISTRIBUTIONS differ by domain; the
    * within-domain percentile is the calibrated unit). pctile_fp ∈
    * [0, 10^6], best-ranked doc → 10^6; `keep_topN` applies one uniform
    * "top keepPct% of every domain" cut.
    *
    * Scale: the per-domain rank is [[Ranking.groupRankDesc]]'s two-level
    * form over 512 score sub-intervals — no domain funnels through one
    * task; everything else is integer arithmetic on the ranked rows. */
  def scoreCalibration(docs: DataFrame, groupCol: String = "source",
                       keepPct: Int = 30, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100)
    val score = qualityFeatures(col(textCol))
      .collectFirst { case (n, c) if n == "quality_score" => c }.get
    val base = docs.select(col(idCol), col(groupCol), score.as("quality_score"))
    Ranking.groupRankDesc(base, groupCol, "quality_score", idCol,
        floor(col("quality_score") * 512).cast("long"))
      .withColumn("pctile_fp",
        expr("(n_group - rank) * 1000000 div greatest(n_group - 1, 1)"))
      .withColumn("keep_top", col("pctile_fp") >= lit((100L - keepPct) * 10000L))
  }

  /** C10 building block: token counts — whitespace tokens and a BPE-ish
    * regex segmentation (letter runs / digit runs / single symbols). */
  def tokenCounts(text: Column): Seq[(String, Column)] = Seq(
    "ws_tokens"  -> size(split(text, " ")).cast("long"),
    "bpe_tokens" -> size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long"))

  /** PII patterns — deliberately restricted to syntax that means the same
    * thing in Java regex (Spark) and RE2 (DuckDB): character classes,
    * bounded/unbounded repetition, no backrefs or lookaround. The three
    * patterns are mutually disjoint (email needs '@', SSN is exactly
    * 3-2-4 digits, phone needs a leading '+') so per-pattern match counts
    * add up to the total number of redactions. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val SsnRe   = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val PhoneRe = "\\+[0-9][0-9()\\- ]{6,}[0-9]"

  /** C14: PII scrub — redact emails / SSNs / phone numbers, count each. */
  def piiRedact(text: Column): Seq[(String, Column)] = {
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        SsnRe, "<SSN>"),
      PhoneRe, "<PHONE>")
    Seq(
      "clean_text" -> redacted,
      "n_emails"   -> size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
      "n_ssns"     -> size(regexp_extract_all(text, lit(SsnRe), lit(0))).cast("long"),
      "n_phones"   -> size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"))
  }

  /** C15: TF-IDF-style top-k salient terms per document. Log-free variant
    * (score = tf·N/df, an exact rational) so the oracle can reproduce the
    * ranking bit-for-bit; log(N/df) is monotone in N/df, so top-k order
    * is the same as classic TF-IDF for tf>0.
    *
    * Scale: one shuffle per aggregation keyed (doc,term) and (term); the
    * corpus size N joins in as a broadcast scalar; final top-k is a
    * per-doc window. */
  def tfidfTopK(docs: DataFrame, k: Int, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val terms = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy("term").agg(countDistinct(col("id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("n_docs")).cast("double") / col("df")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("score").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** C11: order-sensitive rolling-hash fingerprint over the token stream,
    * in a 2^49-range prime field so the polynomial accumulation never
    * overflows a long (ANSI-safe). Same text → same fingerprint; any
    * reorder/edit → different. Runs through the native codegen'd
    * [[graft.functions.RollingHash]] kernel — the `aggregate()` HOF form
    * is interpreted (CodegenFallback) and was the r2 scan-speed killer. */
  def fingerprint(text: Column): Column =
    graft.functions.RollingHashFunctions.rollingHash(tokens(text), portable = false)

  /** C11 (portable twin): same rolling hash with the md5-derived 31-bit
    * token hash, so DuckDB replays it via list_reduce — the fold starts at
    * 0 in Spark and at the first element in DuckDB, which coincide because
    * (0*31 + h1) mod M = h1 for h1 < M. All terms stay < 2^54: no
    * overflow on either engine. Same native kernel, md5 token hash. */
  def fingerprintPortable(text: Column): Column =
    graft.functions.RollingHashFunctions.rollingHash(tokens(text), portable = true)

  /** C25: per-document REPETITION profile (Gopher-style quality filter:
    * heavily self-repeating documents are low-quality training data).
    * Multiplicity-preserving shingle hashes → per-(doc, shingle) counts →
    * per-doc totals: total/distinct n-grams, the most-repeated n-gram's
    * count, and the duplicate-n-gram fraction 1 − distinct/total. The
    * hashes are the portable md5 kernel, so q71's oracle replays every
    * number exactly. One explode + two codegen'd aggregations — no
    * per-row HOF loops. */
  def repetitionProfile(docs: DataFrame, n: Int = 3,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.SignatureFunctions.allShingleHashes
    docs.select(col(idCol),
        explode(allShingleHashes(split(col(textCol), " "), n)).as("h"))
      .groupBy(col(idCol), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum(col("c")).as("total_ngrams"),
        count(lit(1)).as("distinct_ngrams"),
        max(col("c")).as("max_repeat"))
      .withColumn("dup_ratio",
        lit(1.0) - col("distinct_ngrams").cast("double") / col("total_ngrams"))
  }

  /** C87: cross-corpus n-gram NOVELTY — the memorization/benchmark-overlap
    * audit at span granularity: for each CURRENT document, the fraction of
    * its distinct n-grams never seen in the REFERENCE corpus (novelty 0 ⇒
    * fully recoverable from the reference — a memorization risk if the
    * reference is training data, a contamination signal if it is an eval
    * set; C24/C80 ask "does it overlap", this scores HOW MUCH). Same
    * portable md5 shingle kernel as C25/C36, so the oracle replays every
    * hash; per-doc distinct shingles (array_distinct before the explode —
    * multiplicity is C25's business), one distinct-hash reference frame,
    * one hash-partitioned anti join, integer per-mille. Docs shorter than
    * one n-gram don't appear (no denominator), per contract. */
  def ngramNovelty(docs: DataFrame, isRef: Column, n: Int = 8,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.functions.SignatureFunctions.allShingleHashes
    val grams = docs.select(col(idCol), isRef.as("is_ref"),
      explode(array_distinct(allShingleHashes(split(col(textCol), " "), n))).as("h"))
    val ref = grams.filter(col("is_ref")).select("h").distinct()
    val cur = grams.filter(!col("is_ref"))
    val novel = cur.join(ref, Seq("h"), "left_anti")
      .groupBy(idCol).agg(count(lit(1)).as("n_novel"))
    cur.groupBy(idCol).agg(count(lit(1)).as("n_grams"))
      .join(novel, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"))
      .withColumn("novelty_pm", expr("n_novel * 1000 div n_grams"))
      .orderBy(idCol)
  }

  /** C30: canonical text form — Unicode NFC (native codegen'd
    * [[graft.functions.NormalizeNfc]] kernel) → lowercase → collapse runs
    * of whitespace to one space → trim. The standard pre-dedup
    * normalization: "É́"-style composition variants, case variants
    * and whitespace variants of the same document must hash identically
    * or every dedup stage (exact AND near) silently misses them. Each
    * step is cross-engine portable (DuckDB: nfc_normalize / lower /
    * regexp_replace 'g' / trim), so the oracle replays the canonical
    * form byte-for-byte. Pure per-row string ops: scan speed, no shuffle. */
  def canonicalize(text: Column): Column =
    trim(regexp_replace(lower(graft.functions.TextFunctions.normalizeNfc(text)),
      "\\s+", " "))

  /** C30: exact dedup ON the canonical form — emits the full doc →
    * canonical-doc mapping (every row, so downstream joins can rewrite
    * references), where canonical = min id among docs sharing a canonical
    * hash. ONE shuffle on the (high-cardinality) canonical hash; the
    * min-id resolution is a window over those hash partitions, never a
    * second scan or self-join. */
  def canonicalDedup(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__ch"))
    docs.select(col(idCol), md5(canonicalize(col(textCol))).as("__ch"))
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select(col(idCol), col("canonical_id"), col("n_copies"),
        col("__ch").as("canonical_hash"))
  }

  /** C31: corpus-adaptive RARITY score — an LM-free quality proxy:
    * documents dominated by corpus-rare tokens are disproportionately
    * boilerplate/gibberish/ID-soup, and "mean inverse document-token
    * frequency" is the classical signal for it. Per-token rarity is the
    * INTEGER quotient `scale div count(token)` (frequent tokens → 0-ish,
    * hapaxes → scale), summed per document — all integer arithmetic, so
    * unlike a log-probability surprisal the score is bit-identical on any
    * engine and associative across partitions (no float-order hazard).
    *
    * Scale: one explode + one count agg over the vocabulary (Zipf-small
    * vs the corpus) + one equi-join token→count. The vocab side of the
    * join is the aggregate, which AQE will broadcast when it fits; the
    * heavy-hitter skew of natural language lands on the *small* join key
    * side (counts), not on replicated rows. */
  /** C48: BPE merge-candidate scan — the inner step of byte-pair-encoding
    * tokenizer training: count every ADJACENT symbol pair in the corpus
    * and rank merge candidates by frequency. One training iteration =
    * this scan + applying the winning merge; the scan is the scale-
    * critical part (it touches the whole corpus; the merge rewrites it).
    *
    * Scale (100 TB): adjacent pairs are a PER-ROW array operation —
    * `arrays_zip(slice(tk, 1, n-1), slice(tk, 2, n-1))` (all codegen'd,
    * no higher-order functions, no window) — so pair extraction runs at
    * scan speed with zero shuffle; the only shuffle is the map-side-
    * partial pair count, and the ranking is TakeOrderedAndProject, never
    * a full sort. A per-doc window-lead formulation would shuffle the
    * entire token stream; this shuffles only (pair, partial count). */
  def bpePairCounts(docs: DataFrame, topK: Int = 50,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    val n = size(tk)
    // single-token docs: slice length 0 → empty zip → no rows (no filter needed)
    val zipped = arrays_zip(slice(tk, lit(1), n - 1), slice(tk, lit(2), n - 1))
    docs.select(explode(zipped).as("z"))
      .select(col("z").getField("0").as("tok"), col("z").getField("1").as("next_tok"))
      .groupBy("tok", "next_tok").agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("n_pairs").desc, col("tok").asc, col("next_tok").asc)
      .limit(topK)
  }

  /** C152: token CO-OCCURRENCE LIFT — the PMI-family association signal
    * (word2vec's training statistic, collocation mining's ranking): for
    * token pairs co-occurring within a `window`-token span, how much
    * MORE often do they appear together than independence predicts?
    * PMI = log lift, and log is monotone, so ranking by EXACT INTEGER
    * lift needs no log at all (the C143 trick: compare the argument,
    * not the transform):
    *
    *   lift_ppm = 10⁶ · n_ab · T² div (P · n_a · n_b)
    *
    * with n_a/n_b unigram occurrence counts, T total tokens, n_ab the
    * pair's co-occurrence events, P total co-occurrence events —
    * p(ab)/(p(a)·p(b)) with p(ab) = n_ab/P and p(a) = n_a/T, in exact
    * ppm (DECIMAL(38,0) products, oracle HUGEINT).
    *
    * Pairs are UNORDERED ((least, greatest), a ≠ b) and generated
    * PER ROW with zero shuffle: for each gap d in 1..window,
    * `arrays_zip(slice(tk,1,n−d), slice(tk,1+d,n−d))` — the C48 BPE
    * pattern, all codegen'd — so the only shuffles are the two
    * map-side-partial count aggregations, and the final top-k is
    * TakeOrderedAndProject, never a sort. `minPair` prunes the long
    * tail of singleton pairs BEFORE the lift arithmetic — rare pairs
    * dominate raw PMI rankings (the classic instability), so the floor
    * is part of the statistic's contract, not an optimization.
    *
    * @return top-k rows (tok_a, tok_b, n_ab, n_a, n_b, lift_ppm),
    *         ranked lift DESC, ties (tok_a, tok_b) ASC. */
  def cooccurrenceLift(docs: DataFrame, window: Int = 5, minPair: Long = 5L,
                       topK: Int = 30, textCol: String = "text"): DataFrame = {
    require(window >= 1 && minPair >= 1 && topK >= 1)
    val tk = tokens(col(textCol))
    val uni = docs.select(explode(tk).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n_t"))
    val totT = uni.agg(sum("n_t").cast("long").as("tot_t"))
    val n = size(tk)
    // docs shorter than the gap: clamp the slice length at 0 (slice
    // throws on negative lengths; empty zips contribute nothing)
    val pairCols = (1 to window).map { d =>
      val len = greatest(n - d, lit(0))
      arrays_zip(slice(tk, lit(1), len), slice(tk, lit(1) + d, len))
    }
    val pairs = docs.select(explode(concat(pairCols: _*)).as("z"))
      .select(col("z").getField("0").as("x"), col("z").getField("1").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("tok_a"),
        greatest(col("x"), col("y")).as("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPair)
    val totP = pairs.agg(sum("n_ab").cast("long").as("tot_p"))
    // vocab joins stay plain equi-joins (co-partitioned on the token):
    // the vocabulary is NOT safely broadcastable at web scale, and the
    // minPair filter has already shrunk the pair frame; AQE still
    // broadcasts when the vocab is actually small
    pairs
      .join(uni.select(col("t").as("tok_a"), col("n_t").as("n_a")), "tok_a")
      .join(uni.select(col("t").as("tok_b"), col("n_t").as("n_b")), "tok_b")
      .crossJoin(broadcast(totT)).crossJoin(broadcast(totP))
      .select(col("tok_a"), col("tok_b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("cast(cast(1000000 as decimal(38,0)) * n_ab * tot_t * tot_t div " +
          "(cast(tot_p as decimal(38,0)) * n_a * n_b) as bigint)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("tok_a").asc, col("tok_b").asc)
      .limit(topK)
  }

  /** C153: TEXTRANK keyword extraction (Mihalcea & Tarau 2004) — the
    * graph-based keyword ranker: tokens are nodes, within-`window`
    * co-occurrence counts are undirected edge weights, and keyword
    * salience is PageRank on that graph ([[Rank.pageRank]] — the exact
    * integer fixed-point iteration the oracle replays round-for-round).
    * The composition completes the family: C152 ranks PAIRS by lift,
    * TextRank ranks TOKENS by graph centrality — frequency-biased
    * hubs and bridge terms score differently than raw counts.
    *
    * Scale shape: the pair extraction is C152's zero-shuffle per-row
    * kernel; the graph collapses to the vocab×vocab co-occurrence frame
    * (`minCount` sparsifies the long tail BEFORE the iteration — part
    * of the statistic, also what keeps the edge frame bounded); each
    * PageRank round is one co-partitioned join + partial agg on that
    * bounded frame; top-k is TakeOrderedAndProject.
    *
    * @return top-k rows (token, rank_fx) — PageRank in 10⁻⁹ fixed
    *         point, ties broken token ASC. */
  def textRankKeywords(docs: DataFrame, window: Int = 3, minCount: Long = 2L,
                       iters: Int = 6, topK: Int = 30,
                       textCol: String = "text"): DataFrame = {
    require(window >= 1 && minCount >= 1 && topK >= 1)
    val tk = tokens(col(textCol))
    val n = size(tk)
    val pairCols = (1 to window).map { d =>
      val len = greatest(n - d, lit(0))
      arrays_zip(slice(tk, lit(1), len), slice(tk, lit(1) + d, len))
    }
    val und = docs.select(explode(concat(pairCols: _*)).as("z"))
      .select(col("z").getField("0").as("x"), col("z").getField("1").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .filter(col("w") >= minCount)
    // symmetrize in ONE pass over the co-occurrence aggregation (the
    // union form evaluated the corpus pair extraction once per branch)
    val edges = und.select(explode(array(
        struct(col("a").as("src"), col("b").as("dst"), col("w")),
        struct(col("b").as("src"), col("a").as("dst"), col("w")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"), col("__e.w").as("w"))
    Rank.pageRank(edges, iters = iters)
      .select(col("node").as("token"), col("r").as("rank_fx"))
      .orderBy(col("rank_fx").desc, col("token").asc)
      .limit(topK)
  }

  /** C159: ROUGE-N overlap scoring (Lin 2004) — the n-gram
    * precision/recall/F1 between paired texts, the evaluation primitive
    * of every summarization/generation pipeline (and the pairwise
    * companion of C87's corpus-level novelty): per (candidate,
    * reference) pair, the CLIPPED n-gram match count
    * Σ_g min(count_cand(g), count_ref(g)) — the ROUGE/BLEU clipping
    * rule, so a candidate repeating one reference gram doesn't farm
    * matches — with exact ppm read-outs
    *
    *   p = 10⁶·m div n_cand,  r = 10⁶·m div n_ref,
    *   f1 = 2·10⁶·m div (n_cand + n_ref)   (the algebraic 2PR/(P+R))
    *
    * all truncating integer divisions, NULL (not a division error) when
    * a side has no n-grams.
    *
    * Scale shape: n-gram counts explode per side and reduce map-side to
    * (pair, gram) frames joined CO-PARTITIONED on (pair, gram) — linear
    * in token volume, no pair×vocab blowup; the per-pair totals are a
    * bounded second aggregate.
    *
    * @param pairs one row per pair: (idCol, candCol text, refCol text).
    * @return (id, n_match, n_cand, n_ref, p_ppm, r_ppm, f1_ppm). */
  def rougeN(pairs: DataFrame, n: Int, idCol: String = "pair_id",
             candCol: String = "cand", refCol: String = "ref"): DataFrame = {
    require(n >= 1 && n <= 8)
    val base = pairs.select(col(idCol).as("id"),
        tokens(col(candCol)).as("__ct"), tokens(col(refCol)).as("__rt"))
      .withColumn("__cg", expr(
        s"CASE WHEN size(__ct) >= $n THEN transform(sequence(1, size(__ct) - ${n - 1}), i -> concat_ws(' ', slice(__ct, i, $n))) ELSE array() END"))
      .withColumn("__rg", expr(
        s"CASE WHEN size(__rt) >= $n THEN transform(sequence(1, size(__rt) - ${n - 1}), i -> concat_ws(' ', slice(__rt, i, $n))) ELSE array() END"))
      .select(col("id"), col("__cg"), col("__rg"),
        size(col("__cg")).cast("long").as("n_cand"),
        size(col("__rg")).cast("long").as("n_ref"))
      // three references below (both gram sides + the totals) — the
      // shared-subplan lazy-persist discipline, not an eager checkpoint
      .persist()
    val cc = base.select(col("id"), explode(col("__cg")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("cc"))
    val rc = base.select(col("id"), explode(col("__rg")).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("rc"))
    val m = cc.join(rc, Seq("id", "g"))
      .groupBy("id").agg(sum(least(col("cc"), col("rc"))).as("m"))
    base.select("id", "n_cand", "n_ref")
      .join(m, Seq("id"), "left")
      .withColumn("n_match", coalesce(col("m"), lit(0L)))
      .select(col("id"), col("n_match"), col("n_cand"), col("n_ref"),
        when(col("n_cand") > 0, expr("1000000 * n_match div n_cand")).as("p_ppm"),
        when(col("n_ref") > 0, expr("1000000 * n_match div n_ref")).as("r_ppm"),
        when(col("n_cand") + col("n_ref") > 0,
          expr("2000000 * n_match div (n_cand + n_ref)")).as("f1_ppm"))
  }

  /** C55: vocabulary COVERAGE CURVE — "what fraction of corpus tokens
    * does a top-k vocabulary cover", evaluated at several k in one query:
    * the tokenizer-budget planning curve (choose vocab size by where the
    * curve flattens), the aggregate complement of C45's per-doc OOV rate.
    *
    * Scale (100 TB): the corpus collapses to the vocab frame in one
    * map-side-partial pass, and the vocab then collapses AGAIN to its
    * DISTINCT-FREQUENCY profile (cnt → how many terms have that cnt):
    * the coverage of a top-k vocabulary depends only on the frequency
    * MULTISET — equal-count terms are interchangeable, so which of them
    * a tie-break admits at the k boundary never changes covered_tokens
    * or vocab_used. That kills the r10-flagged vocab-sized unpartitioned
    * rank window: the one remaining global cumulative window runs over
    * distinct frequency VALUES, which is ≤ √(2N) by construction
    * (d distinct positive counts sum to ≥ d(d+1)/2, so d(d+1)/2 ≤ N
    * total tokens) — ~4.5M rows of two longs at N = 10¹³, versus a
    * vocab that can be 10¹⁰ terms. Products ride DECIMAL(38,0) (cnt·m
    * overflows int64 at web scale); coverage is one final division. */
  def coverageCurve(docs: DataFrame, ks: Seq[Long] = Seq(10L, 100L, 1000L, 10000L),
                    textCol: String = "text"): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    // distinct-frequency profile: m terms share frequency cnt
    val prof = counts.groupBy("cnt").agg(count(lit(1)).as("m"))
    // cnt is unique per profile row → the cumulative window is total-ordered
    val w = Window.orderBy(col("cnt").desc).rowsBetween(Window.unboundedPreceding, -1)
    val cum = prof
      .withColumn("terms_before", coalesce(sum(col("m")).over(w), lit(0L)))
    // a frequency group contributes min(m, max(0, k - terms_before)) of
    // its terms to the top-k vocabulary, each carrying cnt tokens
    cum.select(col("cnt"), col("m"), col("terms_before"), explode(typedlit(ks)).as("k"))
      .withColumn("take", greatest(lit(0L), least(col("m"), col("k") - col("terms_before"))))
      .groupBy("k")
      .agg(sum(expr("CAST(take AS DECIMAL(38,0)) * cnt")).cast("long").as("covered_tokens"),
           sum(expr("CAST(m AS DECIMAL(38,0)) * cnt")).cast("long").as("total_tokens"),
           sum(col("take")).as("vocab_used"))
      .withColumn("coverage",
        col("covered_tokens").cast("double") / col("total_tokens"))
      .orderBy("k")
  }

  /** C51: DATASET CARD — the per-source corpus report a training-data
    * release publishes: volume (docs/tokens/chars), exact-duplication
    * rate, language mix and dominant language. The numbers every "what's
    * in this corpus" table is made of, as one query.
    *
    * Scale (100 TB): the plan is a strictly LINEAR aggregation chain —
    * corpus → per-(source, lang, content-hash) → per-(source, lang) →
    * per-source — so the corpus is scanned once BY CONSTRUCTION (no DAG
    * branch for Catalyst's per-branch column pruning to de-duplicate);
    * text is dropped at the first aggregate, so only hashes + partial
    * sums shuffle. The dominant language is a struct-max argmax inside
    * the final aggregate (nl, then lang — ties pick the
    * lexicographically larger language; the oracle mirrors that), never
    * a window. Uniqueness is counted within (source, lang): byte-equal
    * text in two languages is two corpus entries, and it keeps the
    * rollup a pure sum. */
  def datasetCard(docs: DataFrame): DataFrame = {
    val base = docs.select(col("source"), col("lang"), col("n_chars"),
      size(tokens(col("text"))).cast("long").as("nt"), md5(col("text")).as("h"))
    val perDoc = base.groupBy("source", "lang", "h").agg(
      count(lit(1)).as("n"), sum("nt").as("snt"), sum("n_chars").as("sch"))
    val perLang = perDoc.groupBy("source", "lang").agg(
      sum("n").as("nl"), sum("snt").as("snt"), sum("sch").as("sch"),
      count(lit(1)).as("nuh")) // perDoc rows per (source, lang) = distinct hashes
    perLang.groupBy("source").agg(
        sum("nl").as("n_docs"), sum("snt").as("n_tokens"), sum("sch").as("n_chars"),
        sum("nuh").as("n_unique"), count(lit(1)).as("n_langs"),
        max(struct(col("nl"), col("lang"))).as("__top"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_unique"),
        ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs")).as("dup_ratio"),
        col("n_langs"), col("__top.lang").as("top_lang"),
        (col("__top.nl").cast("double") / col("n_docs")).as("top_lang_share"))
  }

  /** C50: target-domain IMPORTANCE weights (the DSIR recipe shape: score
    * every document by how much its token distribution looks like a
    * target domain vs the whole corpus, then resample by that weight).
    * Per-token weight = scale·(n_target+1) div (n_corpus+1) — an
    * add-one-smoothed frequency ratio in EXACT integer arithmetic (the
    * rarity/C31 pattern: associative, no float-order hazard; the global
    * normalizers of a true likelihood ratio are corpus-level scalars that
    * rescale every weight equally, so ranking and thresholding are
    * unaffected). Per-doc importance = integer mean over its tokens.
    *
    * Scale (100 TB): one explode; the vocab aggregate is Zipf-small and
    * both token counts (corpus + target) ride the SAME map-side-partial
    * pass — the target side is a conditional count, not a second scan;
    * AQE broadcasts the vocab join. */
  /** C64: STUPID-BACKOFF bigram LM score — the n-gram-LM quality filter
    * of web-corpus curation (CCNet scores documents by a reference-domain
    * LM and drops the worst tail; Brants et al. 2007 showed the
    * normalization-free "stupid backoff" ratio works at corpus scale):
    * train bigram/unigram counts on the `isTrain` slice (the trusted
    * reference domain), score EVERY document's bigrams by
    *
    *   score(w1,w2) = S·cb(w1,w2) div c1(w1)          bigram seen in train
    *               = 0.4·S·c(w2) div T                 else, w2 seen
    *               = 0                                  else
    *
    * in EXACT integer fixed-point (S = `scale`; the q109 pattern —
    * associative sums, no float-order hazard, engine-replayable). cb ≤ c1
    * always, so scores are bounded by S and per-doc sums can't overflow.
    * Per-doc lm_avg = integer mean over bigrams — a low value means "the
    * reference LM finds this text improbable": the drop signal.
    *
    * Scale (100 TB): the score depends only on the bigram, so it is
    * computed once per DISTINCT corpus bigram (a Zipf-small frame — the
    * vocab joins ride AQE broadcasts) and the token stream joins that
    * scored vocabulary once; train counts are conditional aggregates on
    * the same passes, not a second scan. One explode + one stream join +
    * one per-doc aggregate. */
  def lmScore(docs: DataFrame, isTrain: Column, scale: Long = 1000000000L,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tk = tokens(col(textCol))
    val base = docs.select(col(idCol), isTrain.as("__t"),
      tk.as("__tk"), size(tk).cast("long").as("__n"))
    // doc bigram stream: codegen'd slice+zip (single-token docs drop out)
    val zipped = arrays_zip(slice(col("__tk"), lit(1), (col("__n") - 1).cast("int")),
                            slice(col("__tk"), lit(2), (col("__n") - 1).cast("int")))
    val big = base.select(col(idCol), col("__t"), explode(zipped).as("z"))
      .select(col(idCol), col("__t"),
        col("z").getField("0").as("w1"), col("z").getField("1").as("w2"))
    // train statistics: vocab rows carry the conditional train count (0 =
    // out-of-domain token), total train tokens is a 1-row broadcast
    val uni = base.select(col("__t"), explode(col("__tk")).as("w"))
      .groupBy("w").agg(count(when(col("__t"), 1)).as("c"))
    val total = base.filter(col("__t")).agg(sum("__n").as("total"))
    val bi = big.filter(col("__t")).groupBy("w1", "w2").agg(count(lit(1)).as("cb"))
    val scored = big.select("w1", "w2").distinct()
      .join(bi, Seq("w1", "w2"), "left_outer")
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"), "left_outer")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"), "left_outer")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"),
        when(coalesce(col("cb"), lit(0L)) > 0, expr(s"(${scale}L * cb) div c1"))
          .when(coalesce(col("c2"), lit(0L)) > 0,
            expr(s"(4 * ${scale}L * c2) div (10 * total)"))
          .otherwise(lit(0L)).as("score"))
    val perDoc = big.join(scored, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("score").as("lm_sum"))
    base.select(col(idCol), col("__n").as("n_tokens"))
      .join(perDoc, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_sum"), lit(0L)).as("lm_sum"),
        when(col("n_bigrams") > 0, expr("lm_sum div n_bigrams")).as("lm_avg"))
  }

  /** C65: MODEL-BASED quality classifier — the trained-filter gate of a
    * modern curation pipeline (FineWeb-Edu / LLaMA-style: train a small
    * classifier on a labeled slice, score the whole corpus, keep the
    * high scorers). Features are `dims` hashed 0/1 token-bucket
    * indicators plus a bias (the fastText-bag shape, hashed so the
    * feature space is fixed-width no matter the vocabulary); the model is
    * a linear scorer trained by FULL-BATCH least-mean-squares gradient
    * descent:
    *
    *   w ← w + Σ_i (y_i·S − w·x_i)·x_i  div  (etaDen·N)
    *
    * in EXACT integer fixed-point (S = `scale`, learning rate 1/etaDen).
    * A batch gradient is an ASSOCIATIVE sum — partition-order-proof,
    * map-side-combinable — which is why this trains distributively where
    * per-row SGD (order-dependent) cannot; every engine replays the whole
    * training trajectory integer-for-integer, so q136's oracle verifies
    * TRAINING, not just scoring. Scores are fixed-point probabilities-ish
    * in [~0, ~S]; `predicted` thresholds at S/2.
    *
    * Scale (100 TB): training is ONE corpus-shaped aggregation, however
    * many iterations run. The batch gradient is Xᵀy − (XᵀX)·w, and both
    * moment frames are iteration-INVARIANT: XᵀX is the (dims+1)² bucket
    * co-occurrence matrix, Xᵀy the per-bucket positive-mass vector. A
    * single self-join aggregate over the persisted (doc, bucket) frame
    * (fan-out ≤ per-doc-feature-count per row, ≤ (dims+1)² output keys,
    * map-side partial; the text is tokenized ONCE) computes every
    * gradient any trajectory will ever need; the iterations themselves
    * are exact BigInt arithmetic on the driver over that tiny frame.
    * Driver state is O(dims²) — the k-means-codebook bounded-metadata
    * contract, and the reason `dims` is a HASHED-bucket width, not a
    * vocabulary size. N rides the bias⋈bias diagonal (every doc holds
    * the bias feature); moment sums ride decimal(38,0) so no row count
    * can overflow them. Scoring is element_at on a broadcast literal
    * weight array: per-row arithmetic, no join.
    *
    * NOTE: [[trainQualityWeights]]/[[scoreDocs]] deliberately duplicate
    * this trajectory (the deploy faces can't share the persisted feats
    * frame without changing this oracled plan); `StreamingSpec` pins the
    * two paths score-for-score — any divergence fails the suite. */
  def qualityClassifier(docs: DataFrame, isPositive: Column, dims: Int = 16,
                        iters: Int = 4, scale: Long = 1000000L, etaDen: Long = 4L,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(dims > 0 && iters >= 0 && scale > 0 && etaDen > 0)
    val base = docs.select(col(idCol), isPositive.cast("boolean").as("__y"),
      tokens(col(textCol)).as("__tk"))
    val tokenFeats = base.select(col(idCol), explode(col("__tk")).as("__tok"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long"),
          lit(dims.toLong)).as("b"))
      .distinct()
    val feats = tokenFeats
      .unionByName(base.select(col(idCol), lit(dims.toLong).as("b"))) // bias row per doc
      .repartition(col(idCol)) // both self-join sides + scoring reuse this exchange
      .persist()
    val yF = base.select(col(idCol),
      when(col("__y"), lit(scale)).otherwise(lit(0L)).as("__ys"))
    // One pass: gram(b,b2) = #docs containing both buckets; the diagonal
    // (b == b2) additionally carries Σ ys over docs containing b — Xᵀy —
    // and the bias⋈bias cell is N itself.
    val moments = feats.join(yF, Seq(idCol))
      .join(feats.select(col(idCol), col("b").as("b2")), Seq(idCol))
      .groupBy("b", "b2")
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
           sum(when(col("b") === col("b2"), col("__ys")).otherwise(lit(0L))
             .cast("decimal(38,0)")).as("__ysum"))
      .collect() // ≤ (dims+1)² rows — bounded driver metadata
    val gram = Array.fill(dims + 1, dims + 1)(BigInt(0))
    val xty = Array.fill(dims + 1)(BigInt(0))
    moments.foreach { r =>
      val (b, b2) = (r.getLong(0).toInt, r.getLong(1).toInt)
      gram(b)(b2) = BigInt(r.getDecimal(2).toBigInteger)
      if (b == b2) xty(b) = BigInt(r.getDecimal(3).toBigInteger)
    }
    val n = gram(dims)(dims) // bias⋈bias: one pair per document
    var w = Array.fill(dims + 1)(0L)
    if (n > BigInt(0)) {
      val den = BigInt(etaDen) * n
      for (_ <- 0 until iters) {
        val next = w.clone()
        var b = 0
        while (b <= dims) {
          val g = xty(b) - (0 to dims).map(b2 => gram(b)(b2) * BigInt(w(b2))).sum
          next(b) = next(b) + (g / den).toLong // BigInt /: trunc toward 0
          b += 1
        }
        w = next
      }
    }
    val predCol: Column =
      element_at(array(w.map(lit).toIndexedSeq: _*), (col("b") + 1).cast("int"))
    val scored = feats.withColumn("__wv", predCol).groupBy(col(idCol))
      .agg((count(lit(1)) - 1).as("n_feats"), sum("__wv").as("score"))
    val out = base.select(col(idCol), col("__y")).join(scored, Seq(idCol))
      .select(col(idCol), col("__y").as("label"), col("n_feats"), col("score"),
        (col("score") * 2 > scale).as("predicted"))
    feats.unpersist()
    out
  }

  /** C65 (weights face): train the quality classifier and return just the
    * learned weight vector — the artifact the DEPLOY side (batch
    * [[scoreDocs]], streaming `EventStreams.classifierMonitor`) broadcasts.
    * Identical trajectory to [[qualityClassifier]] (same moments, same
    * BigInt iteration); that method stays self-contained so q136's
    * oracled plan is untouched. */
  def trainQualityWeights(docs: DataFrame, isPositive: Column, dims: Int = 16,
                          iters: Int = 4, scale: Long = 1000000L, etaDen: Long = 4L,
                          idCol: String = "doc_id", textCol: String = "text"): Array[Long] = {
    require(dims > 0 && iters >= 0 && scale > 0 && etaDen > 0)
    val base = docs.select(col(idCol), isPositive.cast("boolean").as("__y"),
      tokens(col(textCol)).as("__tk"))
    val feats = docBucketFeatures(base, dims, idCol).persist()
    val yF = base.select(col(idCol),
      when(col("__y"), lit(scale)).otherwise(lit(0L)).as("__ys"))
    val moments = feats.join(yF, Seq(idCol))
      .join(feats.select(col(idCol), col("b").as("b2")), Seq(idCol))
      .groupBy("b", "b2")
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
           sum(when(col("b") === col("b2"), col("__ys")).otherwise(lit(0L))
             .cast("decimal(38,0)")).as("__ysum"))
      .collect()
    feats.unpersist()
    val gram = Array.fill(dims + 1, dims + 1)(BigInt(0))
    val xty = Array.fill(dims + 1)(BigInt(0))
    moments.foreach { r =>
      val (b, b2) = (r.getLong(0).toInt, r.getLong(1).toInt)
      gram(b)(b2) = BigInt(r.getDecimal(2).toBigInteger)
      if (b == b2) xty(b) = BigInt(r.getDecimal(3).toBigInteger)
    }
    val n = gram(dims)(dims)
    var w = Array.fill(dims + 1)(0L)
    if (n > BigInt(0)) {
      val den = BigInt(etaDen) * n
      for (_ <- 0 until iters) {
        val next = w.clone()
        var b = 0
        while (b <= dims) {
          val g = xty(b) - (0 to dims).map(b2 => gram(b)(b2) * BigInt(w(b2))).sum
          next(b) = next(b) + (g / den).toLong
          b += 1
        }
        w = next
      }
    }
    w
  }

  /** Distinct (doc, hashed-bucket) features + the bias row per doc — the
    * classifier's design matrix in frame form. */
  private def docBucketFeatures(base: DataFrame, dims: Int, idCol: String): DataFrame =
    base.select(col(idCol), explode(col("__tk")).as("__tok"))
      .select(col(idCol),
        pmod(conv(substring(md5(col("__tok")), 1, 15), 16, 10).cast("long"),
          lit(dims.toLong)).as("b"))
      .distinct()
      .unionByName(base.select(col(idCol), lit(dims.toLong).as("b")))

  /** C65 (deploy face): score documents under a trained weight vector —
    * tokenize, hash to buckets, element_at on the broadcast weight
    * literal, one per-doc sum. No join, no training, stream-safe (every
    * op is per-row or a doc-keyed aggregation). */
  def scoreDocs(docs: DataFrame, weights: Array[Long], dims: Int,
                scale: Long = 1000000L, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    require(weights.length == dims + 1, "weights must be dims+1 wide (bias last)")
    val base = docs.select(col(idCol), tokens(col(textCol)).as("__tk"))
    val predCol: Column =
      element_at(array(weights.map(lit).toIndexedSeq: _*), (col("b") + 1).cast("int"))
    docBucketFeatures(base, dims, idCol)
      .withColumn("__wv", predCol)
      .groupBy(col(idCol))
      .agg((count(lit(1)) - 1).as("n_feats"), sum("__wv").as("score"))
      .withColumn("predicted", col("score") * 2 > scale)
  }

  /** C68: classifier CALIBRATION sweep — the step between training a
    * quality filter (C65) and deploying it: for each candidate cut
    * threshold, the confusion counts (tp/fp/fn/tn) and precision /
    * recall / F1 in exact integer fixed-point, so the operator answers
    * "which threshold keeps X% precision" deterministically on both
    * engines. Metrics are `scale`-scaled integer quotients (floor —
    * every operand is non-negative); cells with an empty denominator
    * (no predicted positives, no actual positives) are NULL, and F1 is
    * the integer harmonic mean of the two fixed-point metrics.
    *
    * Scale (100 TB): never k passes and never a k× row fan-out. Each
    * row folds into a BUCKET = #thresholds ≤ its score (a chain of
    * codegen'd comparisons), one partial aggregate reduces the corpus
    * to ≤ (k+1) (bucket × label-count) rows, and every threshold's
    * confusion matrix is a suffix sum over that tiny frame (threshold j
    * predicts positive exactly when bucket ≥ j) — the shuffle carries
    * k+1 keys no matter the corpus size. Totals ride a 1-row broadcast
    * (the established bounded-metadata pattern). */
  def calibrationSweep(scored: DataFrame, thresholds: Seq[Long],
                       scale: Long = 1000000L, labelCol: String = "label",
                       scoreCol: String = "score"): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted &&
      thresholds.distinct.size == thresholds.size, "thresholds: sorted, distinct, non-empty")
    val k = thresholds.size
    val bucket = thresholds.map(t => when(col(scoreCol) >= t, 1).otherwise(0))
      .reduce(_ + _)
    val counts = scored
      .select(col(labelCol).cast("boolean").as("__l"), bucket.as("__bk"))
      .groupBy("__bk").agg(
        count(when(col("__l"), 1)).as("__pos"),
        count(when(!col("__l"), 1)).as("__neg"))
    val totals = counts.agg(coalesce(sum("__pos"), lit(0L)).as("__tpos"),
      coalesce(sum("__neg"), lit(0L)).as("__tneg"))
    val thr = scored.sparkSession.range(1, k + 1L)
      .select(col("id").cast("int").as("threshold_idx"))
      .withColumn("threshold",
        element_at(array(thresholds.map(lit).toIndexedSeq: _*), col("threshold_idx")))
    thr.join(counts, col("__bk") >= col("threshold_idx"), "left_outer")
      .groupBy("threshold_idx", "threshold")
      .agg(coalesce(sum("__pos"), lit(0L)).as("tp"),
           coalesce(sum("__neg"), lit(0L)).as("fp"))
      .crossJoin(broadcast(totals)) // 1-row totals frame
      .select(col("threshold_idx"), col("threshold"), col("tp"), col("fp"),
        (col("__tpos") - col("tp")).as("fn"), (col("__tneg") - col("fp")).as("tn"),
        when(col("tp") + col("fp") > 0, expr(s"($scale * tp) div (tp + fp)"))
          .as("precision_fp"),
        when(col("__tpos") > 0, expr(s"($scale * tp) div __tpos")).as("recall_fp"))
      .withColumn("f1_fp",
        when(col("precision_fp").isNotNull && col("recall_fp").isNotNull &&
          col("precision_fp") + col("recall_fp") > 0,
          expr("(2 * precision_fp * recall_fp) div (precision_fp + recall_fp)")))
  }

  def importanceWeights(docs: DataFrame, isTarget: Column, scale: Long = 1000000L,
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), isTarget.as("__t"),
      explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(
      count(lit(1)).as("__n_corpus"),
      count(when(col("__t"), 1)).as("__n_target"))
    toks.join(vocab, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           sum(expr(s"($scale * (__n_target + 1)) div (__n_corpus + 1)")).as("weight_sum"))
      .withColumn("importance", expr("weight_sum div n_tokens"))
  }

  def rarityScore(docs: DataFrame, scale: Long = 1000000000L,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__cnt"))
    toks.join(vocab, "tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
           sum(expr(s"$scale div __cnt")).as("rarity_sum"))
      .withColumn("rarity_avg", expr("rarity_sum div n_tokens"))
  }

  /** C38: INVERTED-INDEX build — the retrieval-side complement of the
    * chunking operator: term → document-frequency, total term-frequency,
    * and the sorted posting list. One explode + one aggregate; per-doc
    * duplicate occurrences collapse inside `collect_set` so the shuffle
    * carries (term, id) pairs once per distinct pair plus a long counter.
    *
    * Scale (100 TB): posting lists are Zipf-skewed — the head term's list
    * is the corpus itself. Real index layouts block postings; here the
    * `postingsCap` contract keeps the operator scale-safe: lists longer
    * than the cap are emitted as NULL (df/tf still exact — those terms
    * are stopword-class, and a retrieval stack treats them specially
    * anyway). The cap makes the maximum row size a constant, so no group
    * can OOM an executor. */
  def invertedIndex(docs: DataFrame, minDf: Int = 2, postingsCap: Int = 1000,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("term"))
    val stats = toks.groupBy("term")
      .agg(countDistinct(col("id")).as("df"), count(lit(1)).as("total_tf"))
      .filter(col("df") >= minDf)
    // heavy terms are pruned BEFORE the list build — collect_set never
    // sees a group larger than the cap, so max row size is a constant
    val listed = toks.select("term", "id").distinct()
      .join(stats.filter(col("df") <= postingsCap).select("term"), Seq("term"), "left_semi")
      .groupBy("term").agg(sort_array(collect_set(col("id"))).as("__p"))
      // numeric sort first, THEN stringify (lexicographic "10" < "2" would
      // diverge from the oracle's ORDER BY doc_id); the transform lambda
      // is interpreted but runs once per VOCAB term, never per token
      .select(col("term"),
        array_join(transform(col("__p"), _.cast("string")), ",").as("postings"))
    stats.join(listed, Seq("term"), "left_outer")
      .select(col("term"), col("df"), col("total_tf"), col("postings"))
  }

  /** C45: vocabulary COVERAGE / OOV rate — per-document fraction of
    * tokens outside a reference vocabulary (tokenizer-coverage and
    * domain-shift evaluation: a corpus whose OOV rate spikes against the
    * training vocab will tokenize badly).
    *
    * Scale: explode + anti join against the vocab (broadcast — real
    * tokenizer vocabularies are ~10⁵ rows) + two per-doc counts with
    * map-side partials; only (id, token) pairs move. */
  def oovRate(docs: DataFrame, vocab: DataFrame, termCol: String = "term",
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ex = docs.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("tok"))
    val tot = ex.groupBy("id").agg(count(lit(1)).as("n_tokens"))
    val oov = ex.join(broadcast(vocab.select(col(termCol).as("tok"))), Seq("tok"), "left_anti")
      .groupBy("id").agg(count(lit(1)).as("n_oov"))
    tot.join(oov, Seq("id"), "left_outer").na.fill(0L, Seq("n_oov"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_oov"),
        (col("n_oov").cast("double") / col("n_tokens")).as("oov_rate"))
  }

  /** C44: quality-filter FUNNEL — the per-filter kill report every corpus
    * cleaning pipeline publishes (how many documents did each rule
    * remove, in order?). Each document is attributed to the FIRST filter
    * it fails (the when-chain mirrors how a short-circuiting pipeline
    * actually drops rows), then one bounded-key aggregation counts kills
    * and a cumulative window over the |filters|-row stage table derives
    * per-stage in/out counts.
    *
    * Scale: ONE scan of the corpus (the when-chain is a per-row codegen'd
    * expression), a groupBy on ≤ |filters|+1 keys, and all funnel
    * arithmetic on a frame with one row per filter — the only
    * unpartitioned window is over that by-construction tiny frame (the
    * q17/q84 bounded-window pattern). Corpus totals ride a 1-row
    * broadcast (the q43 scalar pattern), never a collect. */
  def filterFunnel(docs: DataFrame, filters: Seq[(String, Column)]): DataFrame = {
    require(filters.nonEmpty, "need at least one filter")
    val spark = docs.sparkSession
    import spark.implicits._
    val firstKill = filters.foldRight(lit(null).cast("string")) {
      case ((name, pred), acc) => when(!coalesce(pred, lit(false)), lit(name)).otherwise(acc)
    }
    val kills = docs.select(firstKill.as("__kill"))
      .filter(col("__kill").isNotNull)
      .groupBy("__kill").agg(count(lit(1)).as("n_killed"))
    val total = docs.agg(count(lit(1)).as("__total"))
    val stages = filters.map(_._1).zipWithIndex
      .map { case (n, i) => (i.toLong + 1, n) }.toDF("stage", "filter")
    val w = Window.orderBy("stage")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stages
      .join(kills, col("filter") === col("__kill"), "left_outer")
      .na.fill(0L, Seq("n_killed"))
      .crossJoin(broadcast(total))
      .withColumn("__cum", sum(col("n_killed")).over(w))
      .select(col("stage"), col("filter"),
        (col("__total") - col("__cum") + col("n_killed")).as("n_in"),
        col("n_killed"),
        (col("__total") - col("__cum")).as("n_out"))
      .orderBy("stage")
  }
}
