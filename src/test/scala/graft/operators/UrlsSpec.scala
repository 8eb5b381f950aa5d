package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C90: the canonicalization rule set, case by case, plus the merge
  * behavior of the dedup (variants collapse, distinct pages don't). */
class UrlsSpec extends SparkSuite {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .as[String].collect().toSeq

  test("C90: each rule erases exactly its variance") {
    assert(canon("https://a.com/x#frag") == Seq("https://a.com/x"))
    assert(canon("HTTPS://A.COM/X") == Seq("https://a.com/X")) // path keeps case
    assert(canon("https://a.com:443/x", "http://a.com:80/x") ==
      Seq("https://a.com/x", "http://a.com/x"))
    assert(canon("https://a.com:8443/x") == Seq("https://a.com:8443/x")) // non-default port survives
    assert(canon("https://a.com/x/", "https://a.com/x///") ==
      Seq("https://a.com/x", "https://a.com/x"))
    assert(canon("https://a.com", "https://a.com/", "https://a.com///") ==
      Seq("https://a.com/", "https://a.com/", "https://a.com/"))
    assert(canon("https://a.com/x?utm_source=f&id=1&gclid=z") ==
      Seq("https://a.com/x?id=1"))
    assert(canon("https://a.com/x?b=2&a=1") == Seq("https://a.com/x?a=1&b=2")) // sorted
    assert(canon("https://a.com/x?utm_a=1&utm_b=2") == Seq("https://a.com/x"))
    // utmx is NOT a tracking prefix match (utm_ only)
    assert(canon("https://a.com/x?utmx=1") == Seq("https://a.com/x?utmx=1"))
  }

  test("C90: dedup collapses spellings of one page, keeps pages apart") {
    val docs = Seq(
      (1L, "https://a.com:443/p?utm_source=x&id=7"),
      (2L, "HTTPS://A.COM/p/?id=7#top"),
      (3L, "https://a.com/p?id=7"),
      (4L, "https://a.com/p?id=8"), // different page
      (5L, "https://b.com/p?id=7")  // different host
    ).toDF("doc_id", "url")
    val got = Urls.urlDedup(docs, col("url"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("https://a.com/p?id=7", 3L, 3L, 1L),
      ("https://a.com/p?id=8", 1L, 1L, 4L),
      ("https://b.com/p?id=7", 1L, 1L, 5L)))
  }
}
