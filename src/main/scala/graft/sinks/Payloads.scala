package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Connector payload shapers — DataFrame → DataFrame transforms that put
 * rows into each destination's wire shape BEFORE the transport layer, so
 * shaping runs distributed (and the RestSink transport just posts opaque
 * batches).
 *
 * Reference shapes (studied, not ported):
 *  - facebook/twitter custom audiences: sha256(lower(email)) in batches of
 *    1000 under a schema header (facebook-ads/src/index.ts:86-118).
 *  - http connector: json | ndjson | array bodies with a batch size
 *    (connectors/http/src/index.ts:11-42).
 *  - hubspot/intercom: objects with an id field + properties map.
 */
object Payloads {

  /** Stable batch ids within each `streamCol` partition. ONLY for
    * high-cardinality streams: each stream value is one window partition,
    * so a constant or 3-value stream funnels everything through one task.
    * For low-cardinality streams use [[assignBatchesSalted]]. */
  def assignBatches(df: DataFrame, batchSize: Int, streamCol: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(streamCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", ((col("__rn") - 1) / batchSize).cast("long"))
      .drop("__rn")
  }

  /** Deterministic salt in [0, salts): the repo's portable-hash pattern
    * (md5-hex prefix → base-16 conv → 31-bit mask), so a DuckDB oracle can
    * replay batch assignment exactly. */
  private[graft] def portableSalt(key: Column, salts: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10).cast("long")
      .bitwiseAND(lit(0x7FFFFFFFL)) % salts

  /** Distributed batch assignment. Destinations need bounded batch
    * MEMBERSHIP, not one global batch sequence — so rows are salted into
    * `salts` independent sub-streams per destination stream and numbered
    * within (stream, salt). Every window partition holds ~n/salts rows
    * (vs n for the naive global window: the r2 scale-killer), the result
    * is still deterministic, and `batch_key` = stream-salt-localIdx is
    * globally unique. Cost: up to `salts` partial trailing batches per
    * stream — noise at 100 M rows, tunable to the destination's tolerance. */
  def assignBatchesSalted(df: DataFrame, batchSize: Int, streamCol: Column,
                          orderCol: Column, saltKey: Column, salts: Int = 64): DataFrame = {
    val salted = df.withColumn("__salt", portableSalt(saltKey, salts))
    val w = Window.partitionBy(streamCol, col("__salt")).orderBy(orderCol)
    salted.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("batch_key",
        concat_ws("-", streamCol, col("__salt"),
          ((col("__rn") - 1) / batchSize).cast("long")))
      .withColumn("seq_in_batch", ((col("__rn") - 1) % batchSize).cast("long"))
      .drop("__rn", "__salt")
  }

  /** Facebook/Twitter audience payloads: one row per ≤batchSize-member
    * batch: (stream, batch_key, payload_json) with schema header + hashed
    * emails. An audience is ONE destination stream, so batching is salted
    * by the member hash — the 100 M-member upload shapes in parallel
    * instead of through a single global-window task. */
  def audienceBatches(df: DataFrame, emailCol: String, batchSize: Int = 1000,
                      salts: Int = 64): DataFrame = {
    val hashed = df.select(lit("audience").as("stream"), sha2(lower(col(emailCol)), 256).as("h"))
    assignBatchesSalted(hashed, batchSize, col("stream"), col("h"), col("h"), salts)
      .groupBy("stream", "batch_key")
      .agg(sort_array(collect_list(col("h"))).as("members"))
      .select(col("stream"), col("batch_key"),
        to_json(struct(
          array(lit("EMAIL_SHA256")).as("schema"),
          col("members").as("data"))).as("payload_json"),
        size(col("members")).cast("long").as("n_members"))
  }

  /** HTTP-connector bodies: every input row JSON-encoded, grouped into
    * batches, emitted in the requested format (json array / ndjson).
    * Batch membership is salted on `orderCol` (rows stay ordered by
    * `orderCol` WITHIN a body) — HTTP batches are a transport chunking,
    * not a global ordering, so no single-task window. */
  def httpBodies(df: DataFrame, format: String, batchSize: Int = 100,
                 orderCol: String, salts: Int = 64): DataFrame = {
    val batched = httpBatchedRows(df, batchSize, orderCol, salts)
    val body = format match {
      case "ndjson" => concat_ws("\n", col("rows_json"))
      case "array" | "json" => concat(lit("["), concat_ws(",", col("rows_json")), lit("]"))
      case other => throw new IllegalArgumentException(s"unknown http format: $other")
    }
    batched.select(col("batch_key"), body.as("body"),
      size(col("rows_json")).cast("long").as("n_rows"))
  }

  /** HTTP-connector TEMPLATED bodies (connectors/http/src/index.ts:26-31):
    * a JSON envelope with `"{{ result.rows }}"` / `"{{ result.row }}"` /
    * `"{{ result.length }}"` macros, plus `{{ env.X }}` / `{{ var }}`
    * rendered once up front via [[graft.model.Template]]. The macro sites
    * are spliced by CONCAT of driver-parsed segments — never regex
    * replacement (row payloads may contain `$`/escapes that would poison
    * a regexp_replace), and the segments are plan literals so the whole
    * body builds codegen'd. `result.row` implies single-row batches, as
    * in the reference. Quoted macro forms only: the macro must stand as a
    * JSON string value in the template, which is what the reference
    * documents. */
  def httpTemplatedBodies(df: DataFrame, template: String, batchSize: Int = 100,
                          orderCol: String, salts: Int = 64,
                          vars: Map[String, String] = Map.empty,
                          env: Map[String, String] = sys.env): DataFrame = {
    val singleRow = template.contains("\"{{ result.row }}\"")
    val effBatch = if (singleRow) 1 else batchSize
    val batched = httpBatchedRows(df, effBatch, orderCol, salts)
    val rowsArr = concat(lit("["), concat_ws(",", col("rows_json")), lit("]"))
    val substitutions: Map[String, org.apache.spark.sql.Column] = Map(
      "\"{{ result.rows }}\"" -> rowsArr,
      "\"{{ result.row }}\"" -> element_at(col("rows_json"), 1),
      "\"{{ result.length }}\"" -> size(col("rows_json")).cast("string"))
    // driver-side segmentation: the result.* macros split the template,
    // var/env templating renders only the LITERAL segments (Template is
    // strict about unknown vars — result.* is ours, not the user's), and
    // everything joins in one concat — deterministic for any payload
    // content (never regex replacement over row data)
    val macroAt = raw"""("\{\{ result\.(rows|row|length) \}\}")""".r
    def litSeg(s: String) = lit(graft.model.Template.render(s, vars, env))
    var last = 0
    val parts = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Column]
    macroAt.findAllMatchIn(template).foreach { m =>
      if (m.start > last) parts += litSeg(template.substring(last, m.start))
      parts += substitutions(m.group(1))
      last = m.end
    }
    if (last < template.length) parts += litSeg(template.substring(last))
    require(parts.nonEmpty, "empty body template")
    batched.select(col("batch_key"), concat(parts.toSeq: _*).as("body"),
      size(col("rows_json")).cast("long").as("n_rows"))
  }

  /** Shared batching for the http shapers: (batch_key, rows_json array),
    * rows JSON-encoded and ordered by `orderCol` within each body. */
  private def httpBatchedRows(df: DataFrame, batchSize: Int, orderCol: String,
                              salts: Int): DataFrame = {
    val rows = df.withColumn("__json", to_json(struct(df.columns.map(col): _*)))
      .withColumn("__stream", lit("http"))
    assignBatchesSalted(rows, batchSize, col("__stream"),
        col(orderCol), col(orderCol), salts)
      .groupBy("batch_key")
      .agg(array_sort(collect_list(struct(col("seq_in_batch"), col("__json"))))
        .as("ordered"))
      .withColumn("rows_json", col("ordered.__json")).drop("ordered")
  }

  /** Hubspot/Intercom-shape upsert objects: external id + properties map,
    * with op decided by the id map (see ReverseEtl.q29UpsertKeys). */
  def upsertObjects(df: DataFrame, externalIdCol: String, props: Seq[String]): DataFrame =
    df.select(
      col(externalIdCol).cast("string").as("external_id"),
      to_json(map_from_arrays(
        array(props.map(lit(_)): _*),
        array(props.map(p => col(p).cast("string")): _*))).as("properties_json"))

  /** Mixpanel-engage-shape profile updates: one `$distinct_id` + `$set`
    * properties object per row (mixpanel connector's user/group profiles). */
  def mixpanelProfiles(df: DataFrame, distinctIdCol: String, props: Seq[String]): DataFrame =
    df.select(to_json(struct(
      col(distinctIdCol).cast("string").as("$distinct_id"),
      map_from_arrays(
        array(props.map(lit(_)): _*),
        array(props.map(p => col(p).cast("string")): _*)).as("$set"))).as("profile_json"))

  /** Google-Sheets-shape table: one header row (row_idx 0) + one values
    * array per data row, ordered by `orderCol` — the whole-table write the
    * sheets connector performs. The ordering window is global by nature
    * (a sheet IS a single ordered object); sheet-sized data only. */
  def sheetRows(df: DataFrame, orderCol: String): DataFrame = {
    val header = df.sparkSession.range(1).select(
      lit(0L).as("row_idx"),
      array(df.columns.map(lit(_)): _*).as("values"))
    val w = Window.orderBy(orderCol)
    val data = df
      .withColumn("row_idx", row_number().over(w).cast("long"))
      .select(col("row_idx"), array(df.columns.map(c => col(c).cast("string")): _*).as("values"))
    header.unionByName(data)
  }

  /** Audience clearing — the reference replays the previously-synced key
    * set from its store and issues deletes
    * (facebook-ads audience clear). Graft-side the "last-synced rows" are
    * the previous snapshot table: hash every member and emit delete
    * batches in the same wire shape as audienceBatches. */
  def audienceClearBatches(prevSnapshot: DataFrame, emailCol: String,
                           batchSize: Int = 1000): DataFrame =
    audienceBatches(prevSnapshot, emailCol, batchSize)
      .withColumn("op", lit("delete"))
}
