package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C90: URL CANONICALIZATION + URL-keyed dedup — the cheapest dedup pass a
 * web corpus gets, run before any content hashing: crawls see the same
 * page under fragment/tracking-param/case/port/trailing-slash variants,
 * and collapsing those is pure string normalization (the rule set every
 * crawl pipeline applies: strip `#fragment`, strip `utm_*`/`gclid`/
 * `fbclid` tracking params, lowercase scheme+host (path stays
 * case-SENSITIVE), strip the scheme's default port, strip trailing
 * slashes off non-root paths, sort surviving query params for a stable
 * key).
 *
 * Everything is built-in string/regexp primitives (codegen'd, no UDF) in
 * the common Spark↔DuckDB regex subset (char classes + anchors only — no
 * lookarounds, so Java regex and RE2 agree), which is what makes the
 * DuckDB oracle replay exact. Scale: canonicalization is a per-row map;
 * the dedup is one groupBy on the canonical key — the same shuffle shape
 * as exact-hash dedup (C1) with the key computed in the scan.
 */
object Urls {

  private val trackingParams = "(^|&)(utm_[a-z]+|gclid|fbclid)=[^&]*"

  /** Canonical form of a URL column. Non-URL strings (no `scheme://`)
    * canonicalize to an empty-host form — callers filter or treat as
    * their own key; deterministic either way. */
  def canonicalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    val sch = lower(regexp_extract(noFrag, "^([A-Za-z]+)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[A-Za-z]+://([^/?#]+)", 1))
    val host = when(sch === "https", regexp_replace(hostPort, ":443$", ""))
      .when(sch === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val q0 = regexp_extract(noFrag, "[?]([^#]*)", 1)
    val q1 = regexp_replace(regexp_replace(q0, trackingParams, ""), "^&+", "")
    val sortedQ = array_join(sort_array(split(q1, "&")), "&")
    concat(sch, lit("://"), host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Collapse a document frame onto canonical URLs: per canonical key the
    * member count, the distinct raw spellings it unified, and the kept
    * (min-id) document — the C47-style canonical-selection rule with the
    * URL as the dedup key. */
  def urlDedup(docs: DataFrame, urlCol: Column, idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), urlCol.as("url"))
      .withColumn("canonical_url", canonicalize(col("url")))
      .groupBy("canonical_url")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url")).as("n_raw_forms"),
        min(idCol).as("keep_doc_id"))
      .orderBy("canonical_url")
}
