package graft.sinks

import org.apache.spark.sql.types._

/**
 * Destination STREAM catalog — graft's answer to the reference's
 * describe-streams protocol exchange (protocol/src/index.ts:65-98: a
 * connector replies with its streams, each `{name, rowType}`, plus a
 * `defaultStream`; studied, not ported). Each destination kind declares
 * the streams it accepts and the row type per stream, transcribed from
 * the connectors' own zod/JSON-schema declarations:
 *  - facebook-ads audience: connectors/facebook-ads/src/index.ts:23-27
 *  - hubspot contacts/companies: connectors/hubspot/src/index.ts:22-48
 *  - intercom contacts/companies: connectors/intercom/src/index.ts:20-49
 *  - resend audience: connectors/resend/src/index.ts:22-26
 *  - mixpanel ads: connectors/mixpanel/row.schema.json
 *  - google-sheets sheet / http rows / file rows: free-form row streams
 *
 * Unlike the reference (where rowType is validated row-at-a-time inside
 * the connector process), the declaration here is EXECUTABLE pre-flight
 * metadata: [[modelFit]] diffs a model's Spark schema against the
 * declared stream before any row moves — missing required columns, type
 * mismatches, and (for non-catchall streams) columns the destination
 * would silently drop. Per-row value rules stay with
 * [[graft.model.SchemaValidation]]; this is the schema-level gate.
 */
object Destinations {

  /** Declared-type tokens mirroring the zod unions the connectors use. */
  sealed trait Accepted { def matches(dt: DataType): Boolean; def label: String }
  case object AString extends Accepted {
    def matches(dt: DataType): Boolean = dt == StringType
    val label = "string"
  }
  case object ANumber extends Accepted {
    def matches(dt: DataType): Boolean = dt.isInstanceOf[NumericType]
    val label = "number"
  }
  case object ABool extends Accepted {
    def matches(dt: DataType): Boolean = dt == BooleanType
    val label = "boolean"
  }
  /** z.coerce.date: date/timestamp, or a string the connector parses. */
  case object ADate extends Accepted {
    def matches(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == StringType
    val label = "date"
  }
  /** z.union([string, number]) — the external-id shape. */
  case object AStringOrNumber extends Accepted {
    def matches(dt: DataType): Boolean = dt == StringType || dt.isInstanceOf[NumericType]
    val label = "string|number"
  }
  /** id or array of ids (hubspot/intercom company_ids). */
  case object AIdOrIds extends Accepted {
    def matches(dt: DataType): Boolean = dt match {
      case ArrayType(e, _) => AStringOrNumber.matches(e)
      case other => AStringOrNumber.matches(other)
    }
    val label = "id|id[]"
  }

  final case class Field(name: String, t: Accepted, required: Boolean)

  /** catchall = the zod `.catchall(z.any())` — extra columns become
    * custom attributes instead of being dropped. */
  final case class StreamSpec(name: String, fields: Seq[Field], catchall: Boolean)

  final case class DestinationSpec(kind: String, streams: Seq[StreamSpec],
                                   defaultStream: String) {
    def stream(name: String): StreamSpec =
      streams.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"destination $kind has no stream '$name' (has: ${streams.map(_.name).mkString(",")})"))
  }

  private def audience(fields: Field*) = StreamSpec("audience", fields, catchall = false)

  val registry: Map[String, DestinationSpec] = Map(
    "facebook-ads" -> DestinationSpec("facebook-ads",
      Seq(audience(Field("email", AString, required = true))), "audience"),
    "twitter-ads" -> DestinationSpec("twitter-ads",
      Seq(audience(Field("email", AString, required = true))), "audience"),
    "resend" -> DestinationSpec("resend",
      Seq(audience(
        Field("email", AString, required = true),
        Field("name", AString, required = false),
        Field("unsubscribed", ABool, required = false))), "audience"),
    "hubspot" -> DestinationSpec("hubspot", Seq(
      StreamSpec("contacts", Seq(
        Field("id", AStringOrNumber, required = true),
        Field("name", AString, required = false),
        Field("email", AString, required = true),
        Field("company_ids", AIdOrIds, required = false)), catchall = true),
      StreamSpec("companies", Seq(
        Field("id", AStringOrNumber, required = true),
        Field("name", AString, required = true)), catchall = true)), "contacts"),
    "intercom" -> DestinationSpec("intercom", Seq(
      StreamSpec("contacts", Seq(
        Field("external_id", AStringOrNumber, required = true),
        Field("email", AString, required = true),
        Field("name", AString, required = false),
        Field("role", AString, required = false),
        Field("owner_id", AString, required = false),
        Field("phone", AString, required = false),
        Field("avatar", AString, required = false),
        Field("company_ids", AIdOrIds, required = false),
        Field("signed_up_at", ADate, required = false),
        Field("last_seen_at", ADate, required = false),
        Field("unsubscribed_from_emails", ABool, required = false)), catchall = true),
      StreamSpec("companies", Seq(
        Field("name", AString, required = true),
        Field("company_id", AStringOrNumber, required = true),
        Field("plan", AString, required = false),
        Field("size", ANumber, required = false),
        Field("website", AString, required = false),
        Field("industry", AString, required = false),
        Field("remote_created_at", ADate, required = false),
        Field("monthly_spend", ANumber, required = false)), catchall = true)), "contacts"),
    "mixpanel" -> DestinationSpec("mixpanel", Seq(
      StreamSpec("ads", Seq(
        Field("date", ADate, required = true),
        Field("source", AString, required = true),
        Field("campaign_id", AStringOrNumber, required = true),
        Field("group_id", AStringOrNumber, required = false),
        Field("ad_id", AStringOrNumber, required = false),
        Field("campaign_name", AString, required = false),
        Field("cost", ANumber, required = false),
        Field("clicks", ANumber, required = false),
        Field("impressions", ANumber, required = false)), catchall = true)), "ads"),
    "google-sheets" -> DestinationSpec("google-sheets",
      Seq(StreamSpec("sheet", Nil, catchall = true)), "sheet"),
    "http" -> DestinationSpec("http",
      Seq(StreamSpec("rows", Nil, catchall = true)), "rows"),
    "file" -> DestinationSpec("file",
      Seq(StreamSpec("rows", Nil, catchall = true)), "rows"))

  def describe(kind: String): DestinationSpec =
    registry.getOrElse(kind,
      throw new IllegalArgumentException(
        s"unknown destination '$kind' (known: ${registry.keys.toSeq.sorted.mkString(",")})"))

  sealed trait Issue { def column: String; def detail: String }
  final case class MissingRequired(column: String) extends Issue {
    def detail = "required by the stream but absent from the model"
  }
  final case class TypeMismatch(column: String, expected: String, actual: String) extends Issue {
    def detail = s"stream expects $expected, model produces $actual"
  }
  final case class DroppedExtra(column: String) extends Issue {
    def detail = "not part of the stream row type; the destination ignores it"
  }

  /** Schema-level pre-flight: does a model's output fit the stream? */
  def modelFit(schema: StructType, kind: String,
               stream: Option[String] = None): Seq[Issue] = {
    val dest = describe(kind)
    val sp = dest.stream(stream.getOrElse(dest.defaultStream))
    val byName = schema.fields.map(f => f.name -> f.dataType).toMap
    val declared = sp.fields.map(_.name).toSet
    val missing = sp.fields.collect {
      case f if f.required && !byName.contains(f.name) => MissingRequired(f.name)
    }
    val mismatched = sp.fields.collect {
      case f if byName.contains(f.name) && !f.t.matches(byName(f.name)) =>
        TypeMismatch(f.name, f.t.label, byName(f.name).simpleString)
    }
    val dropped =
      if (sp.catchall) Nil
      else schema.fieldNames.toSeq.filterNot(declared.contains).map(DroppedExtra)
    missing ++ mismatched ++ dropped
  }
}
