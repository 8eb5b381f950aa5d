package graft.queries

/** DuckDB oracle SQL for the SQL-expressible §2C entries (C1, C9, C10).
  * Only engine-portable string ops (length/replace/regexp_extract_all) and
  * left-associative double math, mirroring TextAnalysis exactly. */
object TrainingOracle {
  val sql: Map[String, String] = Map(
    "q30_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS canonical_id, COUNT(*) AS n_copies
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY canonical_id""".stripMargin,

    "q38_quality_score" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars_m,
        |  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_words,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |    / (length(text) - length(replace(text, ' ', '')) + 1) AS avg_word_len,
        |  CAST((length(text) - length(replace(text, 'the', ''))) / 3
        |     + (length(text) - length(replace(text, ' a ', ''))) / 3 AS DOUBLE)
        |    / (length(text) - length(replace(text, ' ', '')) + 1) AS stopword_ratio,
        |  least(1.0, (length(text) - length(replace(text, ' ', '')) + 1) / 100.0) * 0.5
        |  + least(1.0, (CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / (length(text) - length(replace(text, ' ', '')) + 1)) / 8) * 0.3
        |  + least(1.0, (CAST((length(text) - length(replace(text, 'the', ''))) / 3
        |      + (length(text) - length(replace(text, ' a ', ''))) / 3 AS DOUBLE)
        |      / (length(text) - length(replace(text, ' ', '')) + 1)) * 5) * 0.2 AS quality_score
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q39_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin
  )
}
