package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps._

/**
 * §2C dedup family — exact, MinHash+LSH, SimHash, n-gram Jaccard.
 *
 * Scale design (100 TB): every candidate-generation step is a key-equality
 * join on a hash bucket (shuffle on (band, signature)), never an all-pairs
 * comparison; mega-buckets (degenerate shingle sets, boilerplate docs) are
 * dropped by `bucketCap` before the join so one hot key cannot OOM an
 * executor. Exact similarity is computed only on surviving candidates.
 * Signatures are arrays of codegen'd xxhash64 calls — no UDFs.
 */
object Dedup {

  /** C1: exact dedup — group by full-content hash, keep the smallest id as
    * canonical. One shuffle on the content hash; at 100 TB the hash is
    * computed map-side so only (hash, id) pairs move. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: `numPerm` minimums over the shingle set, each under
    * an independently-seeded hash. */
  def minhashSignature(shinglesCol: org.apache.spark.sql.Column, numPerm: Int): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      p => array_min(transform(shinglesCol, s => permHash(s, p))))

  /** C2: MinHash + LSH near-duplicate pairs.
    *
    * shingle → signature(numPerm) → `bands` band-hashes → explode →
    * self-join per (band, hash) bucket → exact-Jaccard verify ≥ threshold.
    */
  def minhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   ngram: Int = 3, numPerm: Int = 64, bands: Int = 16,
                   threshold: Double = 0.7, bucketCap: Int = 100): DataFrame = {
    val rowsPerBand = numPerm / bands
    val withSig = docs
      .select(col(idCol).as("id"), shingles(tokens(col(textCol)), ngram).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numPerm))
      .withColumn("bands", transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b)))

    val exploded = withSig.select(col("id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val pairs = lshBucketPairs(exploded, "band_idx", "band_hash", bucketCap)

    val shA = withSig.select(col("id").as("doc_a"), col("sh").as("sh_a"))
    val shB = withSig.select(col("id").as("doc_b"), col("sh").as("sh_b"))
    pairs.join(shA, "doc_a").join(shB, "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Candidate pairs from an exploded (id, bucketIdx, bucketHash) frame:
    * skew-guarded bucket self-join, each unordered pair emitted once. */
  private[operators] def lshBucketPairs(exploded: DataFrame, idxCol: String, hashCol: String,
                                        bucketCap: Int): DataFrame = {
    val sized = exploded
      .join(exploded.groupBy(idxCol, hashCol).agg(count(lit(1)).as("bucket_n")),
            Seq(idxCol, hashCol))
      .filter(col("bucket_n").between(2, bucketCap))
      .drop("bucket_n")
    val a = sized.select(col(idxCol).as("i"), col(hashCol).as("h"), col("id").as("doc_a"))
    val b = sized.select(col(idxCol).as("i"), col(hashCol).as("h"), col("id").as("doc_b"))
    a.join(b, Seq("i", "h")).filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** 64-bit SimHash of the token multiset (frequency-weighted bit votes).
    * Pure higher-order-function SQL so it compiles to codegen'd expressions:
    * per token hash, each bit votes ±1; the sign of each vote total is the
    * signature bit. */
  def simhash64(tokensSql: String): org.apache.spark.sql.Column = expr(
    s"""aggregate(
       |  aggregate(
       |    transform($tokensSql, t -> xxhash64(t)),
       |    array_repeat(0L, 64),
       |    (acc, h) -> zip_with(acc,
       |                   transform(sequence(0, 63),
       |                     i -> CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1L ELSE -1L END),
       |                   (a, b) -> a + b)),
       |  named_struct('bits', 0L, 'i', 0),
       |  (st, v) -> named_struct(
       |      'bits', st.bits + CASE WHEN v > 0 THEN shiftleft(1L, st.i) ELSE 0L END,
       |      'i', st.i + 1),
       |  st -> st.bits)""".stripMargin)

  /** C3: SimHash near-duplicate pairs — 4 bands of 16 bits generate
    * candidates (a near-dup within `maxDist` bit flips must agree on at
    * least one band when maxDist < 4); verify by Hamming distance. */
  def simhashPairs(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
                   maxDist: Int = 3, bucketCap: Int = 1000): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"),
      simhash64(s"split($textCol, ' ')").as("simhash"))
    val exploded = sigs.select(col("id"),
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))))
          .as(Seq("band_idx", "band_hash")))
    val pairs = lshBucketPairs(exploded, "band_idx", "band_hash", bucketCap)
    val sa = sigs.select(col("id").as("doc_a"), col("simhash").as("sim_a"))
    val sb = sigs.select(col("id").as("doc_b"), col("simhash").as("sim_b"))
    pairs.join(sa, "doc_a").join(sb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(sim_a ^ sim_b)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** C4: exact n-gram Jaccard pairs within a candidate group (here: same
    * `source`). At 100 TB candidate generation is LSH (minhashPairs); this
    * is the verify kernel exposed as its own operator for grouped corpora
    * where the group is small enough to pair exhaustively. */
  def ngramJaccardPairs(docs: DataFrame, groupCol: String, textCol: String = "text",
                        idCol: String = "doc_id", ngram: Int = 3,
                        threshold: Double = 0.3): DataFrame = {
    val prepared = docs.select(col(groupCol).as("g"), col(idCol).as("id"),
      shingles(tokens(col(textCol)), ngram).as("sh"))
    val a = prepared.select(col("g"), col("id").as("doc_a"), col("sh").as("sh_a"))
    val b = prepared.select(col("g"), col("id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, "g").filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
