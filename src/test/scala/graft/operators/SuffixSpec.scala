package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** C62 — duplicated-span profiling via distributed suffix ordering. */
class SuffixSpec extends SparkSuite {
  import spark.implicits._

  private def bruteProfile(docs: Seq[(Long, String)], minSpan: Int): Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val positions = for { (id, ts) <- toks.toSeq; p <- ts.indices } yield (id, p)
    def lcp(a: (Long, Int), b: (Long, Int)): Int = {
      val x = toks(a._1).drop(a._2); val y = toks(b._1).drop(b._2)
      x.zip(y).takeWhile { case (u, v) => u == v }.length
    }
    positions.groupBy(_._1).map { case (id, ps) =>
      val dups = ps.map(p => positions.filter(_ != p).map(o => lcp(p, o)).max.toLong)
      id -> (toks(id).length.toLong, dups.max, dups.count(_ >= minSpan).toLong)
    }
  }

  test("dupSpanProfile matches the all-pairs brute force (cross-doc and within-doc spans)") {
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "x y a b c d"),          // shares "a b c d" with doc 1
      (3L, "q r s t u v"),          // fully unique
      (4L, "m n m n m n"),          // within-doc repetition
      (5L, "x y a b c d"))          // exact dup of doc 2
    val got = Suffix.dupSpanProfile(docs.toDF("doc_id", "text"), minSpan = 3)
      .select("doc_id", "n_tokens", "max_dup_span", "n_dup_positions")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val want = bruteProfile(docs, minSpan = 3)
    assert(got == want, s"got $got want $want")
    assert(got(5L)._2 == 6L, "exact-dup doc: whole tail duplicated")
    assert(got(3L)._2 == 0L, "unique doc has no duplicated span")
    assert(got(1L)._2 == 4L && got(2L)._2 == 6L)
  }

  test("dupSpanProfile is exact on a real-corpus slice against brute force") {
    // brute force is O(positions²·len): keep the slice small and identical
    // on both sides — duplicated spans are judged within the slice only
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 40).select("doc_id", "text")
      .as[(Long, String)].collect().toSeq
    assert(docs.size > 10, "slice must be non-trivial")
    val got = Suffix.dupSpanProfile(docs.toDF("doc_id", "text"))
      .select("doc_id", "max_dup_span").as[(Long, Long)].collect().toMap
    val want = bruteProfile(docs, minSpan = 8)
    docs.foreach { case (id, _) =>
      assert(got(id) == want(id)._2, s"doc $id: got ${got(id)} want ${want(id)._2}")
    }
  }
}
