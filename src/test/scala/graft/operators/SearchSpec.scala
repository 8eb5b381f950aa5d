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
}
