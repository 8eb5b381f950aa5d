package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C32/C33 — token-window chunking and context-window packing. */
class ChunkingSpec extends SparkSuite {
  import spark.implicits._

  private def doc(n: Int): String = (1 to n).map(i => s"t$i").mkString(" ")

  test("chunkByTokens: closed-form chunk count and exact window boundaries") {
    // n=50 (<= window): one chunk; n=100: [0..63],[48..99]; n=113: +[96..112]
    val docs = Seq((1L, doc(50)), (2L, doc(100)), (3L, doc(113)))
      .toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(docs, window = 64, stride = 48)
      .select("doc_id", "chunk_idx", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long, String)].collect().sortBy(c => (c._1, c._2))

    def h(words: Seq[String]) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(words.mkString(" ").getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    def words(n: Int) = (1 to n).map(i => s"t$i")
    val want = Seq(
      (1L, 0L, 50L, h(words(50))),
      (2L, 0L, 64L, h(words(100).slice(0, 64))),
      (2L, 1L, 52L, h(words(100).slice(48, 100))),
      (3L, 0L, 64L, h(words(113).slice(0, 64))),
      (3L, 1L, 64L, h(words(113).slice(48, 112))),
      (3L, 2L, 17L, h(words(113).slice(96, 113))))
    assert(got.toSeq == want)
  }

  test("chunkByTokens: every token is covered and consecutive chunks overlap by window-stride") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunks = Chunking.chunkByTokens(docs, window = 64, stride = 48)
    val perDoc = chunks.groupBy("doc_id").agg(
        max("chunk_idx").as("last_idx"), count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("sum_tok"), max("n_tokens").as("max_tok"))
      .join(docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n")), "doc_id")
    // last chunk reaches the end: last_start + its tokens == n
    val bad = perDoc.filter(col("last_idx") * 48 + least(col("n") - col("last_idx") * 48, lit(64L)) =!= col("n"))
      .count()
    assert(bad == 0, "last chunk must end exactly at the document's last token")
    assert(perDoc.filter(col("max_tok") > 64).count() == 0, "no chunk exceeds the window")
  }

  test("packContextWindows: two-level distributed prefix sum equals the one global window") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val got = Chunking.packContextWindows(docs, budget = 2048L, blockSize = 64L)
      .select("doc_id", "window_id", "window_offset")
      .as[(Long, Long, Long)].collect().toSet
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs
      .withColumn("prefix", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), expr("prefix div 2048").as("w"), (col("prefix") % 2048).as("o"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want, "block-decomposed scan must equal the global running sum exactly")
  }

  test("packContextWindows: stream layout invariants (contiguous, budget-bounded)") {
    val docs = Seq((10L, 1000L), (11L, 1000L), (12L, 100L), (30L, 2000L), (31L, 5L))
      .toDF("doc_id", "n_tokens")
    val out = Chunking.packContextWindows(docs, budget = 2048L, blockSize = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "window_id", "window_offset")
      .as[(Long, Long, Long, Long)].collect()
    // prefix walk: 0,1000,2000,2100,4100 → windows 0,0,0,1,2; offsets mod 2048
    assert(out.toSeq == Seq(
      (10L, 1000L, 0L, 0L), (11L, 1000L, 0L, 1000L), (12L, 100L, 0L, 2000L),
      (30L, 2000L, 1L, 52L), (31L, 5L, 2L, 4L)))
    assert(out.forall(_._4 < 2048L), "offset must stay inside the window budget")
  }

  test("shardLayout: two-level bucketed scan equals the one-phase global shuffle window") {
    val docs = (0L until 300L).map(i => (i, 5L + (i * 13) % 40)).toDF("doc_id", "n_tokens")
    val got = Chunking.shardLayout(docs, shardTokens = 500L)
      .select("doc_id", "shard_id", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    // one-phase spec: global prefix over (rankHash, doc_id)
    val wG = Window.orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val exp = docs.withColumn("k", Sampling.rankHash(col("doc_id")))
      .withColumn("shard_id", expr("(sum(n_tokens) over (order by k, doc_id " +
        "rows between unbounded preceding and current row) - n_tokens) div 500"))
      .withColumn("pos_in_shard",
        row_number().over(Window.partitionBy("shard_id").orderBy(col("k"), col("doc_id"))).cast("long"))
      .select("doc_id", "shard_id", "pos_in_shard")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == exp)
    // invariants: every doc placed once; shards are ~budget-sized (each
    // shard's token total stays under budget + max doc weight)
    assert(got.size == 300 && got.map(_._1).size == 300)
    val totals = Chunking.shardLayout(docs, shardTokens = 500L)
      .groupBy("shard_id").agg(sum("n_tokens").as("t"))
      .select("t").as[Long].collect()
    assert(totals.forall(_ <= 500L + 44L), s"oversized shard: ${totals.max}")
    assert(totals.length > 3, "budget must produce multiple shards")
  }

  test("paddingAudit: both policies hand-checked; overflow bucket caps at its own max") {
    val docs = Seq(1L -> 10L, 2L -> 16L, 3L -> 17L, 4L -> 30L, 5L -> 600L, 6L -> 700L)
      .toDF("doc_id", "n_tokens")
    val got = Chunking.paddingAudit(docs)
      .select("cap", "n_seqs", "sum_tokens", "max_len",
        "padded_static", "padded_dynamic", "waste_static_fp", "waste_dynamic_fp")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (16L, 2L, 26L, 16L, 32L, 32L, 187500L, 187500L),
      (32L, 2L, 47L, 30L, 64L, 60L, 265625L, 216666L),
      (700L, 2L, 1300L, 700L, 1400L, 1400L, 71428L, 71428L)), s"got $got")
  }

  /** Sequential reference CDC profile using the same portable hash. */
  private def refCdc(texts: Seq[(Long, String)], w: Int, d: Int)
  : Map[Long, (Long, Long, Long, Long)] = {
    import org.apache.spark.unsafe.types.UTF8String
    def h31(s: String): Long =
      graft.functions.HashUtil.md5Hash31(UTF8String.fromString(s))
    val docChunks: Seq[(Long, Vector[String])] = texts.map { case (id, text) =>
      val toks = text.split(" ", -1).toVector
      val n = toks.size
      val nWin = math.max(n - w + 1, if (n > 0) 1 else 0)
      val cuts = (0 until nWin)
        .filter(s => h31(toks.slice(s, s + math.min(w, n)).mkString(" ")) % d == d - 1)
        .map(s => s + w - 1).toSet
      val chunks = Vector.newBuilder[String]
      var cur = Vector.newBuilder[String]
      for (i <- 0 until n) {
        cur += toks(i)
        if (cuts.contains(i) && i < n - 1) { chunks += cur.result().mkString(" "); cur = Vector.newBuilder[String] }
      }
      val last = cur.result()
      if (last.nonEmpty) chunks += last.mkString(" ")
      id -> chunks.result()
    }
    val occ = docChunks.flatMap(_._2).groupBy(identity).map { case (c, o) => c -> o.size }
    docChunks.map { case (id, chunks) =>
      val nTokens = chunks.map(_.split(" ", -1).length.toLong).sum
      val dup = chunks.filter(c => occ(c) >= 2)
      id -> (nTokens, chunks.size.toLong, dup.size.toLong,
        dup.map(_.split(" ", -1).length.toLong).sum)
    }.toMap
  }

  test("cdcChunkProfile matches a sequential reference, dup accounting corpus-wide") {
    val rnd = new scala.util.Random(7)
    val shared = (1 to 40).map(_ => s"s${rnd.nextInt(30)}").mkString(" ")
    val texts = Seq(
      1L -> ((1 to 120).map(_ => s"a${rnd.nextInt(50)}").mkString(" ") + " " + shared),
      2L -> (shared + " " + (1 to 90).map(_ => s"b${rnd.nextInt(50)}").mkString(" ")),
      3L -> "tiny doc",
      4L -> "tiny doc")
    val want = refCdc(texts, w = 4, d = 8)
    val got = Chunking.cdcChunkProfile(texts.toDF("doc_id", "text"), w = 4, divisor = 8)
      .select("doc_id", "n_tokens", "n_chunks", "n_dup_chunks", "dup_tokens")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == want, s"got $got\nwant $want")
    // the two identical short docs are whole-doc chunks, duplicated
    assert(got(3L) == ((2L, 1L, 1L, 2L)))
  }

  test("cdcChunkProfile: a front-of-doc edit leaves all later chunk boundaries intact") {
    val rnd = new scala.util.Random(11)
    val body = (1 to 300).map(_ => s"w${rnd.nextInt(80)}").mkString(" ")
    val docs = Seq(1L -> body, 2L -> ("inserted " + body))
    // recover actual chunk CONTENT via the reference (operator outputs hashes)
    def chunksOf(text: String): Vector[String] = {
      import org.apache.spark.unsafe.types.UTF8String
      def h31(s: String): Long =
        graft.functions.HashUtil.md5Hash31(UTF8String.fromString(s))
      val toks = text.split(" ", -1).toVector
      val n = toks.size
      val cuts = (0 until math.max(n - 3, 1))
        .filter(s => h31(toks.slice(s, s + math.min(4, n)).mkString(" ")) % 8 == 7)
        .map(_ + 3).toSet
      val out = Vector.newBuilder[String]; var cur = Vector.newBuilder[String]
      for (i <- 0 until n) {
        cur += toks(i)
        if (cuts.contains(i) && i < n - 1) { out += cur.result().mkString(" "); cur = Vector.newBuilder[String] }
      }
      val last = cur.result(); if (last.nonEmpty) out += last.mkString(" ")
      out.result()
    }
    val a = chunksOf(docs(0)._2)
    val b = chunksOf(docs(1)._2)
    assert(a.size > 5, s"fixture must chunk well (got ${a.size} chunks)")
    // CDC property: every chunk of the original except the first survives
    // the edit verbatim (boundaries are window-local, not cut-chained)
    assert(a.drop(1).forall(b.contains), "later chunks must be edit-stable")
    // and the engine agrees with the reference on both docs
    val got = Chunking.cdcChunkProfile(docs.toDF("doc_id", "text"), w = 4, divisor = 8)
      .select("doc_id", "n_chunks").as[(Long, Long)].collect().toMap
    assert(got(1L) == a.size.toLong && got(2L) == b.size.toLong)
  }
}
