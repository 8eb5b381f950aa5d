package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * C149: RENDEZVOUS (highest-random-weight) sharding + reshard-movement
 * audit — the shard assignment a 100 TB layout actually wants where
 * B8's salted `mod N` batching does not: under `hash mod N`, growing
 * N → N+1 reshuffles ~N/(N+1) of ALL keys (every resident relocates);
 * under HRW (Thaler & Ravishankar 1998 — the consistent-hashing family
 * without a ring), shard(key) = argmax over s of h(key, s), so adding a
 * shard moves exactly the keys the NEW shard wins — E[moved] = 1/(N+1)
 * — and removing one moves only its own residents.
 *
 * Determinism contract: h = unsigned xxhash64(key || ':' || s) in
 * DECIMAL(38,0) unsigned order (the C127 idiom), argmax ties broken to
 * the SMALLEST shard id (xx collisions only). Assignment is pure
 * per-row arithmetic — one `aggregate` HOF over sequence(0, n−1), no
 * shuffle, no state, any engine replays it (the DuckDB oracle does).
 *
 * Scale shape: assignment is scan-speed and embarrassingly parallel;
 * the movement audit is two assignments + one comparison per row, with
 * the per-(from, to) matrix a bounded n×(n+1) aggregate. Cost is
 * linear in N per key (two xx evaluations per candidate shard) — right
 * for the tens-to-hundreds of shards a table layout uses; for many
 * thousands of cells, shard hierarchically (HRW over shard GROUPS,
 * then within the group) rather than flattening one giant argmax.
 */
object Sharding {

  private val U64 = "18446744073709551616" // 2^64 as decimal literal

  /** Unsigned xx of (key, shard) as a SQL snippet in DECIMAL(38,0). */
  private def hu(keySql: String, shardSql: String): String =
    s"""(CAST(xxhash64(concat($keySql, ':', CAST($shardSql AS STRING))) AS DECIMAL(38,0))
       | + CASE WHEN xxhash64(concat($keySql, ':', CAST($shardSql AS STRING))) < 0
       |        THEN CAST('$U64' AS DECIMAL(38,0)) ELSE 0 END)""".stripMargin

  /** HRW shard across `n` shards, over the staged `__hrw_k` string key
    * (argmax ties to the smallest shard id — `>` keeps the first max). */
  private def hrwShard(n: Int): Column = {
    require(n >= 1)
    val h = hu("__hrw_k", "i")
    expr(
      s"""aggregate(sequence(0, ${n - 1}),
         |  named_struct('s', CAST(-1 AS BIGINT), 'h', CAST(-1 AS DECIMAL(38,0))),
         |  (acc, i) -> CASE WHEN $h > acc.h
         |              THEN named_struct('s', CAST(i AS BIGINT), 'h', $h)
         |              ELSE acc END,
         |  acc -> acc.s)""".stripMargin)
  }

  /** Assign every row its HRW shard among `n` shards. */
  def hrwAssign(df: DataFrame, keyCol: Column, n: Int,
                out: String = "shard"): DataFrame =
    df.withColumn("__hrw_k", keyCol.cast("string"))
      .withColumn(out, hrwShard(n))
      .drop("__hrw_k")

  /** Reshard-movement audit for growing `n` → `m` shards: the
    * per-(from, to) movement matrix plus totals — the evidence row that
    * says "this reshard touches 9% of the corpus, not 90%".
    *
    * @return one row per observed (shard_from, shard_to):
    *         (shard_from, shard_to, n_keys, moved) plus per-row ppm of
    *         the corpus. */
  def reshardAudit(df: DataFrame, keyCol: Column, n: Int, m: Int): DataFrame = {
    require(n >= 1 && m >= 1)
    val assigned = df.select(keyCol.cast("string").as("__hrw_k"))
      .withColumn("shard_from", hrwShard(n))
      .withColumn("shard_to", hrwShard(m))
    val total = assigned.agg(count(lit(1)).as("__n_total"))
    assigned
      .groupBy("shard_from", "shard_to")
      .agg(count(lit(1)).as("n_keys"))
      .withColumn("moved", col("shard_from") =!= col("shard_to"))
      .crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("n_keys * 1000000 div __n_total"))
      .drop("__n_total")
  }
}
