package graft.operators

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
}
