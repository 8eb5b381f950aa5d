package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * §2C similarity / ANN family over an `Array[Float]` embedding column.
 *
 * All vector math is `zip_with`/`aggregate` over array columns — codegen'd
 * built-ins, no UDFs, so the dot products run inside whole-stage codegen.
 *
 * Scale design (100 TB): queries are broadcast (they are the small side by
 * construction); brute force is embarrassingly parallel over corpus
 * partitions with a top-k reduction per query; the LSH path buckets the
 * corpus ONCE (computed map-side) and turns candidate generation into a
 * bucket-equality shuffle join, so cost is ~|collisions| not |Q|×|corpus|.
 */
object Similarity {

  /** Element-wise double view of a float-array column. */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** C5: brute-force cosine top-k — the exact ANN baseline. `queries` must
    * be small (it is broadcast); ranking is windowed per query_id, so the
    * only shuffle is |Q|×k-bounded after AQE-local partial filtering. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos_sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  // Hyperplanes are deterministic pseudo-random: component (t,p,d) =
  // pmod(xxhash64("graft-hp", t, p, d), 2000)/1000 - 1 ∈ [-1, 1) —
  // reproducible across runs and executors, no RNG state to ship.

  /** C6: LSH-bucketed ANN — `tables` independent 2^planes-bucket tables;
    * a query only scores corpus vectors sharing a bucket in some table.
    * Smaller `planes` → higher recall & bigger buckets; tune per corpus. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              tables: Int = 4, planes: Int = 6, dims: Int = 64,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def withBuckets(df: DataFrame, idAs: String, vecAs: String): DataFrame = {
      val v = asDouble(col(vecCol))
      df.select(col(idCol).as(idAs), v.as(vecAs),
          posexplode(transform(sequence(lit(0), lit(tables - 1)),
            // per-table bucket; t is a Column so planeComponent seeds vary by table via hash args
            t => aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
              (acc, p) => acc * 2 + when(
                aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
                  (s, d) => s + element_at(v, d + 1) *
                    (pmod(xxhash64(lit("graft-hp"), t, p, d), lit(2000L)).cast("double") / 1000.0 - 1.0)) > 0,
                1L).otherwise(0L))))
          .as(Seq("tbl", "bucket")))
    }
    val c = withBuckets(corpus, "neighbor_id", "cv")
    val q = withBuckets(queries, "query_id", "qv")
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos_sim"))
      .distinct() // same pair can collide in several tables
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** C7: embedding near-dup pairs — corpus self-join through LSH buckets,
    * cosine-verified at `threshold`. Same bucket-join scale story as C6. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   tables: Int = 4, planes: Int = 6, dims: Int = 64,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val v = asDouble(col(vecCol))
    val b = corpus.select(col(idCol).as("id"), v.as("vec"),
        posexplode(transform(sequence(lit(0), lit(tables - 1)),
          t => aggregate(sequence(lit(0), lit(planes - 1)), lit(0L),
            (acc, p) => acc * 2 + when(
              aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
                (s, d) => s + element_at(v, d + 1) *
                  (pmod(xxhash64(lit("graft-hp"), t, p, d), lit(2000L)).cast("double") / 1000.0 - 1.0)) > 0,
              1L).otherwise(0L))))
        .as(Seq("tbl", "bucket")))
    val l = b.select(col("tbl"), col("bucket"), col("id").as("doc_a"), col("vec").as("va"))
    val r = b.select(col("tbl"), col("bucket"), col("id").as("doc_b"), col("vec").as("vb"))
    l.join(r, Seq("tbl", "bucket")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), cosine(col("va"), col("vb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }
}
