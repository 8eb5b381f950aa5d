package graft.operators

import graft.operators.Lineage.LineageOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C124: INDEX-ACCELERATED exact substring search — "find every document
 * containing THIS literal" without a full-text scan: the pattern's
 * character n-grams prefilter candidates against the corpus gram
 * postings (a document containing the pattern necessarily contains
 * every one of its n-grams — the prefilter is a strict superset), and
 * the exact `contains` verifies only the survivors. The retrieval twin
 * of C38's term inverted index and C24's shingle-probe decontamination,
 * at character granularity (substring, not token, so it catches
 * mid-token and cross-token hits).
 *
 * Result contract: EXACTLY equals the full-scan `contains` — the spec
 * and the DuckDB oracle both pin that equality, so the acceleration can
 * never change answers. Patterns shorter than the gram width fall back
 * to the scan (no gram can witness them).
 *
 * Scale shape: the gram postings are what a real deployment
 * MATERIALIZES once (doc → distinct n-grams, the C38/C27 index
 * discipline) and probes per query at k-posting cost; the inline form
 * here streams the explode through a BROADCAST join against the
 * pattern's ≤|pattern| grams — a codegen'd filter, no corpus-wide
 * shuffle — then groups only the matching (doc, gram) survivors, and
 * runs the exact verify on the candidate set alone.
 */
object Search {

  /** All documents whose text contains the literal `pattern`.
    * @return (doc_id) — identical to the full-scan contains filter. */
  def substringSearch(docs: DataFrame, idCol: Column, textCol: Column,
                      pattern: String, n: Int = 8): DataFrame = {
    require(pattern.nonEmpty, "empty pattern matches everything — refuse")
    val d = docs.select(idCol.as("doc_id"), textCol.as("text"))
    if (pattern.length < n)
      d.filter(col("text").contains(pattern)).select("doc_id")
    else {
      val grams = pattern.sliding(n).toSeq.distinct
      val spark = docs.sparkSession
      val gramsDf = spark.createDataFrame(grams.map(Tuple1(_))).toDF("g")
      val cands = d
        // sequence(1, 0) would run DESCENDING in Spark — guard the
        // too-short docs out (they cannot contain the pattern anyway)
        .filter(length(col("text")) >= lit(n))
        .select(col("doc_id"), explode(expr(
          s"transform(sequence(1, length(text) - ${n - 1}), i -> substring(text, i, $n))"))
          .as("g"))
        .join(broadcast(gramsDf), "g") // codegen'd prefilter, no shuffle
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("k"))
        .filter(col("k") === grams.size)
        .select("doc_id")
      d.join(cands, "doc_id")
        .filter(col("text").contains(pattern)) // exact verify, candidates only
        .select("doc_id")
    }
  }

  /** Fixed-point binary logarithm, 10 fractional bits, as a SQL
    * expression over the (positive BIGINT) sub-expression `x`:
    * `log2q10(x) = round-down fixed point of 1024·log2(x)` computed by
    * the classic integer mantissa-squaring algorithm — `e = ⌊log2 x⌋`
    * from the bit length, mantissa scaled to 2^20, then ten exact
    * integer squaring steps each emitting one fraction bit. Every step
    * is int64 (mantissa < 2^21, square < 2^42) and floor-divides, so the
    * value is a deterministic pure-integer function both engines replay
    * bit-for-bit — the portable surrogate for the IEEE `ln` BM25 needs
    * (cross-engine float logs are not hash-stable; this is).
    *
    * The fold rides Spark's `aggregate` higher-order function (codegen'd
    * lambda, no UDF); the DuckDB oracle replays it with `list_reduce`
    * over the same struct state. */
  def log2q10Sql(x: String): String = {
    val e = s"(length(bin($x)) - 1)"
    val m0 = s"(CASE WHEN $e >= 20 THEN ($x) div shiftleft(1L, $e - 20) " +
      s"ELSE ($x) * shiftleft(1L, 20 - $e) END)"
    s"""aggregate(sequence(1, 10),
       |  named_struct('m', CAST($m0 AS BIGINT), 'acc', CAST($e AS BIGINT) * 1024L, 'w', 512L),
       |  (s, i) -> CASE WHEN s.m * s.m div 1048576L >= 2097152L
       |            THEN named_struct('m', s.m * s.m div 2097152L, 'acc', s.acc + s.w, 'w', s.w div 2L)
       |            ELSE named_struct('m', s.m * s.m div 1048576L, 'acc', s.acc, 'w', s.w div 2L) END,
       |  s -> s.acc)""".stripMargin
  }

  /** C126: BM25 ranked retrieval — the SCORED companion to the exact
    * substring/term lookups (C124 finds "documents containing X"; this
    * ranks "the best documents FOR query X"): Okapi BM25 with the
    * Lucene-shaped always-positive idf `log2((2N+2)/(2df+1))` and the
    * standard saturated term frequency, every quantity exact-integer so
    * the ranking is bit-stable across engines — idf in q10 fixed point
    * (units 2^-10, via [[log2q10Sql]]), length norm and tf saturation in
    * per-mille, score = Σ idf_q10·tfs_pm (units 2^-10·10^-3).
    *
    * Scale shape: corpus stats are ONE tiny agg (broadcast 1-row); the
    * term frame is filtered to the queries' literal vocabulary BEFORE
    * any shuffle (a codegen'd `IN` on the scan, so df/tf aggregate only
    * matching postings); query terms and idf join broadcast; and the
    * final per-query top-k runs through [[Ranking.groupRankDesc]]'s
    * two-level bucketed rank — a popular query matching half the corpus
    * never funnels through one window task. A real deployment
    * materializes the tf/df frames once (the C38 index discipline) and
    * scores per query at posting-list cost.
    *
    * Overflow contract: the length-norm product `1000·dl·N` is taken in
    * DECIMAL(38,0) (at web scale dl·N exceeds int64); everything after
    * the divide is back in int64 with documented bounds (idf_q10 ≤
    * ~64·1024, tfs_pm ≤ k1+1000, per-term product ≤ 2^27·|q|).
    *
    * @param queries (query_id, space-separated terms) literals; repeated
    *                terms in a query count once.
    * @return (query_id, rank, doc_id, score_q10pm, n_terms) — rank ≤ k,
    *         ties broken by doc_id ASC, only docs matching ≥1 term. */
  def bm25TopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
               k1Pm: Long = 1200L, bPm: Long = 750L,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && k >= 1 && k1Pm >= 0 && bPm >= 0 && bPm <= 1000)
    val termSet = queries.flatMap(_._2.split(" ")).distinct
    val toks = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    // postings for the query vocabulary only — the IN prefilter rides the
    // scan, so the groupBy shuffles matching (doc, term) rows, not the corpus
    val tf = toks.filter(col("term").isInCollection(termSet))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    val stats = docs.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(split(col(textCol), " "))).cast("long").as("l_total"))
    val df = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
    scoreBm25(tf, df, stats, queries, k, k1Pm, bPm)
  }

  /** The BM25 scoring kernel over pre-built index frames — shared by the
    * inline [[bm25TopK]] and the incrementally-maintained index (D32,
    * `streaming/EventStreams.bm25FromIndex`), so "score from state"
    * equals "score from corpus" by construction and the maintained
    * index is tested against the one-shot path.
    *
    * @param tf    postings (doc_id, dl, term, tf) — may contain terms
    *              outside the query vocabulary (filtered here).
    * @param df    (term, df) document frequencies.
    * @param stats ONE row (n_docs, l_total). */
  def scoreBm25(tf: DataFrame, df: DataFrame, stats: DataFrame,
                queries: Seq[(Int, String)], k: Int = 10,
                k1Pm: Long = 1200L, bPm: Long = 750L): DataFrame = {
    require(queries.nonEmpty && k >= 1 && k1Pm >= 0 && bPm >= 0 && bPm <= 1000)
    val spark = tf.sparkSession
    val termSet = queries.flatMap(_._2.split(" ")).distinct
    val qt = spark.createDataFrame(queries.flatMap { case (qid, text) =>
        text.split(" ").distinct.map(t => (qid, t))
      }).toDF("query_id", "term")
    val idf = df.filter(col("term").isInCollection(termSet))
      .crossJoin(broadcast(stats))
      .withColumn("idf_q10",
        expr(s"${log2q10Sql("2 * n_docs + 2")} - ${log2q10Sql("2 * df + 1")}"))
      .select("term", "idf_q10")
    val scored = tf.filter(col("term").isInCollection(termSet))
      .join(broadcast(qt), "term")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("dlnorm_pm", expr(
        "CAST(CAST(1000 AS DECIMAL(38,0)) * dl * n_docs div l_total AS BIGINT)"))
      .withColumn("tfs_pm", expr(
        s"tf * ${k1Pm + 1000L}L * 1000000L div " +
          s"(tf * 1000000L + ${k1Pm}L * (1000L * ${1000L - bPm}L + ${bPm}L * dlnorm_pm))"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("idf_q10 * tfs_pm")).as("score_q10pm"),
        count(lit(1)).as("n_terms"))
    Ranking.groupRankDesc(scored, "query_id", "score_q10pm", "doc_id",
        expr("score_q10pm div 1024"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_q10pm", "n_terms")
  }

  /** C156: DIRICHLET-smoothed QUERY-LIKELIHOOD retrieval (Zhai &
    * Lafferty 2001) — the language-modeling ranking beside C126's BM25
    * (the other canonical probabilistic retrieval family; LM scoring is
    * also what perplexity-based corpus filters are built from):
    *
    *   score(q, d) = Σ_{t∈q} log( (tf_td + μ·P(t|C)) / (dl_d + μ) )
    *
    * with P(t|C) = g_t/M the collection unigram. EXACT integer form via
    * the q10 binary log: term_q10 = l2(tf·M + μ·g_t) − l2((dl+μ)·M) —
    * scores are NEGATIVE q10 bits (log-probabilities), higher = better.
    * The Dirichlet prior means a candidate document is scored on EVERY
    * query term including the ones it lacks (tf = 0 → the collection
    * prior — what separates LM retrieval from a tf-only scorer);
    * query terms absent from the whole corpus (g = 0) contribute
    * nothing and are dropped, documented.
    *
    * Scale shape: the C126 discipline end-to-end — the IN prefilter
    * rides the scan so only query-vocabulary postings aggregate;
    * CANDIDATES are docs matching ≥1 term (posting-list cost); the
    * per-candidate full-vocabulary fan-out is |q| broadcast rows per
    * candidate; the 1-row corpus stats broadcast; top-k through the
    * two-level bucketed rank (trunc-div buckets stay monotone for
    * negative scores).
    *
    * Overflow contract: tf·M + μ·g ≤ (dl_max + μ)·M < 2⁶³ while
    * M < ~3·10⁹ tokens with μ ≤ 10⁴; shard or widen past it (the C99
    * bound family).
    *
    * @param queries (query_id, space-separated terms); repeated terms
    *                count once.
    * @param mu      Dirichlet prior mass (the classic 2000).
    * @return (query_id, rank, doc_id, score_q10, n_match) — rank ≤ k,
    *         ties doc_id ASC; n_match = query terms present in doc. */
  def dirichletQlTopK(docs: DataFrame, queries: Seq[(Int, String)], k: Int = 10,
                      mu: Long = 2000L,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queries.nonEmpty && k >= 1 && mu >= 1)
    val spark = docs.sparkSession
    val termSet = queries.flatMap(_._2.split(" ")).distinct
    val qt = spark.createDataFrame(queries.flatMap { case (qid, text) =>
        text.split(" ").distinct.map(t => (qid, t))
      }).toDF("query_id", "term")
    val toks = docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
    val stats = docs.agg(
      sum(size(split(col(textCol), " "))).cast("long").as("m_total"))
    // collection frequency of the query vocabulary — tiny, broadcast;
    // g = 0 terms never reach the score (dropped with the inner join)
    val g = toks.filter(col("term").isInCollection(termSet))
      .groupBy("term").agg(count(lit(1)).cast("long").as("g"))
    val tf = toks.filter(col("term").isInCollection(termSet))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    // candidates: docs matching >= 1 query term, then the full
    // per-query vocabulary fan-out so missing terms score the prior
    val cand = tf.join(broadcast(qt), "term")
      .select("query_id", "doc_id", "dl").distinct()
    val full = cand.join(broadcast(qt), "query_id")
      .join(tf.select(col("doc_id"), col("term"), col("tf")), Seq("doc_id", "term"), "left")
      .join(broadcast(g), "term")
      .crossJoin(broadcast(stats))
      .withColumn("tf0", coalesce(col("tf"), lit(0L)))
      .withColumn("term_q10", expr(
        s"${log2q10Sql("tf0 * m_total + " + mu + " * g")} - " +
          s"${log2q10Sql(s"(dl + $mu) * m_total")}"))
    val scored = full.groupBy("query_id", "doc_id")
      .agg(sum(col("term_q10")).as("score_q10"),
        sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("n_match"))
    Ranking.groupRankDesc(scored, "query_id", "score_q10", "doc_id",
        expr("score_q10 div 1024"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_q10", "n_match")
  }

  /** C134: exact PHRASE search through a POSITIONAL index — "find every
    * document where these tokens appear ADJACENT and IN ORDER": the
    * token-level companion to C124's character substring search and the
    * capability that separates a positional index from C38's doc-level
    * postings (which can only say "contains all the words somewhere").
    *
    * The anchor trick makes it ONE aggregation instead of an n-way
    * positional self-join: a phrase occurrence starting at position p
    * means token i of the phrase sits at p+i for every i, so each
    * matching posting (doc, pos, term) emits (doc, pos−i, i) for every
    * phrase slot i the term fills (duplicate phrase terms emit several
    * slots), and an anchor holding ALL n distinct slots is an
    * occurrence. Result contract = EXACT equality with the direct
    * token-array sliding-window scan, which the oracle and spec pin.
    *
    * Scale shape: the postings explode is prefiltered to the phrase's
    * literal vocabulary (codegen'd IN on the scan), the slot fan-out is
    * ≤ phrase length per posting, and the occurrence test is one
    * co-partitioned (doc, anchor) aggregation — no joins at all. A
    * real deployment materializes the positional postings once (the
    * C38/D32 index discipline) and probes at posting-list cost.
    *
    * @return (doc_id, n_matches) for docs with ≥1 occurrence. */
  def phraseSearch(docs: DataFrame, phrase: String,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val terms = phrase.split(" ").toSeq
    require(terms.nonEmpty && terms.forall(_.nonEmpty))
    val n = terms.size
    val slots = terms.zipWithIndex.groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2) }
    val slotRows = slots.toSeq.flatMap { case (t, is) => is.map(i => (t, i)) }
    val spark = docs.sparkSession
    val slotDf = spark.createDataFrame(slotRows).toDF("term", "slot")
    val postings = docs
      .select(col(idCol).as("doc_id"), posexplode(split(col(textCol), " ")).as(Seq("pos", "term")))
      .filter(col("term").isInCollection(terms.distinct))
    postings.join(broadcast(slotDf), "term")
      .select(col("doc_id"), (col("pos") - col("slot")).as("anchor"), col("slot"))
      .filter(col("anchor") >= 0)
      .groupBy("doc_id", "anchor")
      .agg(countDistinct("slot").as("k"))
      .filter(col("k") === n)
      .groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
  }

  /** C136: PSEUDO-RELEVANCE-FEEDBACK query expansion (the RM3 shape,
    * Lavrenko & Croft 2001 / Abdul-Jaleel 2004, in exact integers) —
    * the classic recall lever when queries are short and vocabulary
    * mismatched: run BM25 once, treat the top-f documents as relevant,
    * mine the e terms that most distinguish them (Σ over feedback docs
    * of tf·idf, original terms excluded, ties term-asc), and re-score
    * with the expanded weighted query (original terms weight 1000‰,
    * expansion terms `lambdaPm`). Every quantity is the C126 integer
    * kernel, so mining and both scoring passes replay bit-for-bit.
    *
    * Scale shape: pass 1 is BM25's own shape; the feedback postings
    * explode runs over the TOP-f DOCS ONLY; expansion-candidate df/idf
    * are computed for the feedback VOCABULARY only (broadcast semi
    * join — the data-dependent analog of the literal IN prefilter);
    * pass 2 scores against the ≤(q-terms + e) expanded vocabulary.
    * Everything after pass 1's corpus scan is feedback-sized.
    *
    * @return (query_id, rank, doc_id, score_q10pm, n_terms) — the
    *         re-scored top-k; n_terms counts matched expanded terms. */
  def prfExpandedBm25(docs: DataFrame, queries: Seq[(Int, String)],
                      f: Int = 5, e: Int = 3, lambdaPm: Long = 400L, k: Int = 10,
                      k1Pm: Long = 1200L, bPm: Long = 750L,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(f >= 1 && e >= 1 && lambdaPm >= 0 && lambdaPm <= 1000)
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val top = bm25TopK(docs, queries, f, k1Pm, bPm, idCol, textCol)
      .select(col("query_id"), col("doc_id")).cut()
    val qt = spark.createDataFrame(queries.flatMap { case (qid, text) =>
        text.split(" ").distinct.map(t => (qid, t))
      }).toDF("query_id", "term")
    // feedback postings: ALL terms of the top-f docs only
    val fbTf = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(top.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .cut()
    val candTerms = fbTf.select("term").distinct()
    val stats = docs.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(size(split(col(textCol), " "))).cast("long").as("l_total"))
      .cut()
    // corpus postings restricted to the feedback vocabulary (+ the
    // original query terms, whose idf pass 2 needs as well)
    val vocab = candTerms.unionByName(qt.select("term")).distinct()
    val tfAll = docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__toks"))
      .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
        explode(col("__toks")).as("term"))
      .join(broadcast(vocab), Seq("term"), "left_semi")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .cut()
    val idf = tfAll.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("idf_q10",
        expr(s"${log2q10Sql("2 * n_docs + 2")} - ${log2q10Sql("2 * df + 1")}"))
      .select("term", "idf_q10").cut()
    // expansion mining: weight(query, term) = Σ_{d ∈ F_q} tf · idf
    val expansion = fbTf
      .join(top, Seq("doc_id"))
      .join(broadcast(idf), "term")
      .groupBy("query_id", "term")
      .agg(sum(expr("tf * idf_q10")).as("wgt"))
      .join(broadcast(qt.withColumn("__orig", lit(1))), Seq("query_id", "term"), "left_anti")
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id").orderBy(col("wgt").desc, col("term").asc)))
      .filter(col("__rn") <= e)
      .select(col("query_id"), col("term"), lit(lambdaPm).as("w_pm"))
    val qtw = qt.withColumn("w_pm", lit(1000L)).unionByName(expansion)
    // pass 2: weighted BM25 over the expanded vocabulary
    val scored = tfAll
      .join(broadcast(qtw), "term")
      .join(broadcast(idf), "term")
      .crossJoin(broadcast(stats))
      .withColumn("dlnorm_pm", expr(
        "CAST(CAST(1000 AS DECIMAL(38,0)) * dl * n_docs div l_total AS BIGINT)"))
      .withColumn("tfs_pm", expr(
        s"tf * ${k1Pm + 1000L}L * 1000000L div " +
          s"(tf * 1000000L + ${k1Pm}L * (1000L * ${1000L - bPm}L + ${bPm}L * dlnorm_pm))"))
      .groupBy("query_id", "doc_id")
      .agg(sum(expr("w_pm * idf_q10 * tfs_pm div 1000")).as("score_q10pm"),
        count(lit(1)).as("n_terms"))
    Ranking.groupRankDesc(scored, "query_id", "score_q10pm", "doc_id",
        expr("score_q10pm div 1024"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "score_q10pm", "n_terms")
  }

  /** C135: best-window SNIPPET extraction (search-result highlighting) —
    * for each query's BM25 top-k documents, the w-token window with the
    * highest summed idf of matched query-term OCCURRENCES (repeats count;
    * rare terms dominate, as a highlighter should), ties to the EARLIEST
    * window. The optimal window can always shift to start at a matched
    * token, so anchors = match positions and the per-anchor score is one
    * RANGE-frame window sum over `[pos, pos+w−1]` — no self-join, no
    * per-token expansion beyond the query-vocabulary matches.
    *
    * Exact integers end-to-end (idf in q10 via [[log2q10Sql]]), so both
    * engines pick the identical window and emit the identical snippet
    * string. Scale shape: BM25's own shape for the top-k, then the
    * position explode runs over the TOP DOCS ONLY (left-semi before
    * exploding) and is prefiltered to the query vocabulary on the scan.
    *
    * @return (query_id, rank, doc_id, start_pos (0-based), snippet_q10,
    *         snippet). */
  def bestSnippet(docs: DataFrame, queries: Seq[(Int, String)], w: Int = 8, k: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 1 && k >= 1 && queries.nonEmpty)
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val termSet = queries.flatMap(_._2.split(" ")).distinct
    val top = bm25TopK(docs, queries, k, idCol = idCol, textCol = textCol)
      .select(col("query_id"), col("doc_id"), col("rank"))
      .cut()
    val qt = spark.createDataFrame(queries.flatMap { case (qid, text) =>
        text.split(" ").distinct.map(t => (qid, t))
      }).toDF("query_id", "term")
    val idf = docs
      .select(col(idCol).as("doc_id"), explode(split(col(textCol), " ")).as("term"))
      .filter(col("term").isInCollection(termSet))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term").agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).cast("long").as("n_docs"))))
      .withColumn("idf_q10",
        expr(s"${log2q10Sql("2 * n_docs + 2")} - ${log2q10Sql("2 * df + 1")}"))
      .select("term", "idf_q10")
    val matched = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(top.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
      .filter(col("term").isInCollection(termSet))
      .join(broadcast(qt), "term")
      .join(broadcast(idf), "term")
      .join(top, Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        col("pos").cast("long").as("pos"), col("idf_q10"))
    val anchored = matched.withColumn("snippet_q10", sum("idf_q10").over(
        Window.partitionBy("query_id", "doc_id").orderBy(col("pos"))
          .rangeBetween(Window.currentRow, w - 1)))
      .withColumn("__rn", row_number().over(
        Window.partitionBy("query_id", "doc_id")
          .orderBy(col("snippet_q10").desc, col("pos").asc)))
      .filter(col("__rn") === 1)
    anchored
      .join(docs.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("pos").as("start_pos"), col("snippet_q10"),
        expr(s"concat_ws(' ', slice(split(text, ' '), CAST(pos AS INT) + 1, $w))")
          .as("snippet"))
  }

  /** C132: RECIPROCAL-RANK FUSION (Cormack et al. SIGIR 2009) — the
    * standard hybrid-retrieval combiner: fuse ANY per-query rankings
    * (lexical BM25, embedding ANN, …) by summing `1 / (k₀ + rank)`
    * across sources, which needs no score calibration between systems
    * whose scores live on incomparable scales — only ranks. Exact
    * integer ppm (`1000000 div (k₀ + rank)` per source, summed), so
    * the fused ordering replays bit-for-bit; ties break by doc_id
    * under the same two-level bucketed top-k as BM25 (no per-query
    * single-task funnel).
    *
    * @param rankings one frame per source, each (query_id, doc_id,
    *                 rank) with rank 1-based; a doc absent from a
    *                 source simply contributes nothing (the RRF
    *                 convention).
    * @param kRrf the damping constant k₀ (60 in the paper).
    * @return (query_id, rank, doc_id, rrf_ppm, n_sources). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, kRrf: Long = 60L): DataFrame = {
    require(rankings.nonEmpty && k >= 1 && kRrf >= 1)
    val tagged = rankings.map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionAll _)
    val fused = tagged.groupBy("query_id", "doc_id")
      .agg(sum(expr(s"1000000 div ($kRrf + rank)")).as("rrf_ppm"),
        count(lit(1)).as("n_sources"))
    Ranking.groupRankDesc(fused, "query_id", "rrf_ppm", "doc_id",
        expr("rrf_ppm div 1024"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "rrf_ppm", "n_sources")
  }
}
