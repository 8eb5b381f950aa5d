package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * C118: RECORD-LINKAGE scoring (Fellegi & Sunter 1969, deterministic
 * integer form) — the identity-resolution face of the dedup family:
 * dedup asks "is this the same DOCUMENT", linkage asks "is this the
 * same ENTITY" across records whose fields individually lie (typos,
 * moved addresses, reused phones). The classic machinery: BLOCK on
 * cheap keys to bound the candidate space, score each candidate pair
 * by summing per-field agreement/disagreement weights (the integer
 * stand-ins for the log-likelihood ratios the probabilistic model
 * estimates), classify against the (lower, upper) thresholds into
 * possible/match. Reverse-ETL context: the upsert-key resolution (B10)
 * and audience-merge steps assume a resolved identity — this operator
 * is where that resolution comes from when no shared key exists.
 *
 * All-integer scoring with null-safe field equality (two NULLs agree —
 * the F-S convention for missing-at-random fields is to zero-weight
 * them; callers wanting that pass a `coalesce`d column), so the DuckDB
 * oracle replays pairs and scores bit-for-bit.
 *
 * Scale shape: ONE self-join co-partitioned on the block key — the
 * candidate space is Σ C(block,2), never corpus², and blocks larger
 * than `blockCap` are DROPPED before the join (the Dedup bucketCap
 * convention: one hot block cannot OOM an executor; re-block finer
 * when real data hits the cap). Everything downstream is per-pair
 * codegen'd column arithmetic; sub-`lower` pairs are filtered before
 * the output so the quadratic non-match mass never materializes.
 */
object Linkage {

  /** Score blocked candidate pairs and classify the survivors.
    *
    * @param df       one row per record.
    * @param idCol    unique record id (pairs emit id_a < id_b).
    * @param blockCols blocking keys — candidates must share all of them.
    * @param fields   (column, agreeWeight, disagreeWeight) per compared
    *                 field; agreement is null-safe equality.
    * @param upper    score ≥ upper → "match".
    * @param lower    score ≥ lower → kept (else dropped); "possible"
    *                 below upper.
    * @param blockCap blocks with more rows than this are dropped whole.
    * @return (id_a, id_b, score, linkage_class). */
  def scorePairs(df: DataFrame, idCol: Column, blockCols: Seq[Column],
                 fields: Seq[(Column, Long, Long)], upper: Long, lower: Long,
                 blockCap: Int = 10000): DataFrame = {
    require(fields.nonEmpty && upper >= lower)
    val bNames = blockCols.indices.map(i => s"__b$i")
    val named = df.select(
      idCol.as("__id") +:
        (blockCols.zip(bNames).map { case (c, n) => c.as(n) } ++
          fields.zipWithIndex.map { case ((c, _, _), i) => c.as(s"__f$i") }): _*)
    val sized = named
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(bNames.map(col): _*)))
      .filter(col("__bn") <= blockCap).drop("__bn")
    val a = sized.select(
      col("__id").as("id_a") +:
        (bNames.map(col) ++ fields.indices.map(i => col(s"__f$i").as(s"__fa$i"))): _*)
    val b = sized.select(
      col("__id").as("id_b") +:
        (bNames.map(col) ++ fields.indices.map(i => col(s"__f$i").as(s"__fb$i"))): _*)
    val score = fields.zipWithIndex.map { case ((_, agree, disagree), i) =>
      when(col(s"__fa$i") <=> col(s"__fb$i"), lit(agree)).otherwise(lit(disagree))
    }.reduce(_ + _)
    a.join(b, bNames.toSeq).filter(col("id_a") < col("id_b"))
      .withColumn("score", score)
      .filter(col("score") >= lower)
      .select(col("id_a"), col("id_b"), col("score"),
        when(col("score") >= upper, "match").otherwise("possible").as("linkage_class"))
  }

  /** Score PROBE records against an INDEX — the incremental form (D31):
    * new records arriving in a stream compare against the persisted
    * record store, never against each other here (within-batch pairs
    * are [[scorePairs]]' job). Same blocking/weights/thresholds; the
    * cap applies to INDEX blocks (the side that grows without bound).
    *
    * @param probe new records; @param index stored records. Both must
    *              carry the id/block/field columns the extractors name.
    * @return (id_probe, id_index, score, linkage_class). */
  def scoreAgainst(probe: DataFrame, index: DataFrame, idCol: Column,
                   blockCols: Seq[Column], fields: Seq[(Column, Long, Long)],
                   upper: Long, lower: Long, blockCap: Int = 10000): DataFrame = {
    require(fields.nonEmpty && upper >= lower)
    val bNames = blockCols.indices.map(i => s"__b$i")
    def shape(df: DataFrame, idName: String, fTag: String) = df.select(
      idCol.as(idName) +:
        (blockCols.zip(bNames).map { case (c, n) => c.as(n) } ++
          fields.zipWithIndex.map { case ((c, _, _), i) => c.as(s"__$fTag$i") }): _*)
    val idx = shape(index, "id_index", "fb")
      .withColumn("__bn", count(lit(1)).over(Window.partitionBy(bNames.map(col): _*)))
      .filter(col("__bn") <= blockCap).drop("__bn")
    val score = fields.zipWithIndex.map { case ((_, agree, disagree), i) =>
      when(col(s"__fa$i") <=> col(s"__fb$i"), lit(agree)).otherwise(lit(disagree))
    }.reduce(_ + _)
    shape(probe, "id_probe", "fa").join(idx, bNames.toSeq)
      .withColumn("score", score)
      .filter(col("score") >= lower)
      .select(col("id_probe"), col("id_index"), col("score"),
        when(col("score") >= upper, "match").otherwise("possible").as("linkage_class"))
  }
}
