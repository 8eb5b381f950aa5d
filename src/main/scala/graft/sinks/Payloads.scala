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

  /** Stable batch ids within each `streamCol` partition — the window is
    * always partitioned so no global-ordering bottleneck exists at scale. */
  def assignBatches(df: DataFrame, batchSize: Int, streamCol: Column, orderCol: Column): DataFrame = {
    val w = Window.partitionBy(streamCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", ((col("__rn") - 1) / batchSize).cast("long"))
      .drop("__rn")
  }

  /** Facebook/Twitter audience payloads: one row per 1000-member batch:
    * (stream, batch_id, payload_json) with schema header + hashed emails. */
  def audienceBatches(df: DataFrame, emailCol: String, batchSize: Int = 1000): DataFrame = {
    val hashed = df.select(lit("all").as("stream"), sha2(lower(col(emailCol)), 256).as("h"))
    assignBatches(hashed, batchSize, col("stream"), col("h"))
      .groupBy("stream", "batch_id")
      .agg(collect_list(col("h")).as("members"))
      .select(col("stream"), col("batch_id"),
        to_json(struct(
          array(lit("EMAIL_SHA256")).as("schema"),
          col("members").as("data"))).as("payload_json"),
        size(col("members")).cast("long").as("n_members"))
  }

  /** HTTP-connector bodies: every input row JSON-encoded, grouped into
    * batches, emitted in the requested format (json array / ndjson). */
  def httpBodies(df: DataFrame, format: String, batchSize: Int = 100,
                 orderCol: String): DataFrame = {
    val rows = df.withColumn("__json", to_json(struct(df.columns.map(col): _*)))
      .withColumn("__stream", lit("all"))
    val batched = assignBatches(rows, batchSize, col("__stream"), col(orderCol))
      .groupBy("batch_id").agg(collect_list(col("__json")).as("rows_json"))
    val body = format match {
      case "ndjson" => concat_ws("\n", col("rows_json"))
      case "array" | "json" => concat(lit("["), concat_ws(",", col("rows_json")), lit("]"))
      case other => throw new IllegalArgumentException(s"unknown http format: $other")
    }
    batched.select(col("batch_id"), body.as("body"),
      size(col("rows_json")).cast("long").as("n_rows"))
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
