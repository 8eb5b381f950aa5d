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

  /** One credential property, as a draft-07-ish JSON-schema field: `t` is
    * the JSON type name ("string" | "integer" | "number" | "boolean" |
    * "array" | "any"); `enumVals` non-empty pins the accepted values. */
  final case class CredField(name: String, t: String, required: Boolean,
                             desc: String = "", enumVals: Seq[String] = Nil)

  /** Per-kind CONNECTION credential schemas, transcribed from the
    * connectors' own declarations (the reference serves these over the
    * describe protocol exchange and `add connection` prompts from them,
    * commands/add.ts:56-97):
    *  - facebook-ads: accessToken+accountId (facebook-ads/src/index.ts:16-19)
    *  - twitter-ads: 4 OAuth1 secrets + accountId (twitter-ads/src/index.ts:8-14)
    *  - hubspot: accessToken (hubspot/src/index.ts:18-20)
    *  - intercom: accessToken (intercom/src/index.ts:14-16)
    *  - resend: apiKey (resend/src/index.ts:16-18)
    *  - mixpanel: projectToken + tuning knobs (mixpanel/credentials.schema.json)
    *  - google-sheets: service-account key blob (google-sheets/src/index.ts:18-20)
    *  - file: filePath (file/src/index.ts:6-8)
    *  - http: url/method/headers/format/body/batchSize/timeout
    *    (http/src/index.ts:11-38) */
  val credentialSchemas: Map[String, Seq[CredField]] = Map(
    "facebook-ads" -> Seq(
      CredField("accessToken", "string", required = true),
      CredField("accountId", "string", required = true,
        desc = "Ad account id; 'act_' prefix optional")),
    "twitter-ads" -> Seq(
      CredField("consumerKey", "string", required = true),
      CredField("consumerSecret", "string", required = true),
      CredField("accessToken", "string", required = true),
      CredField("accessTokenSecret", "string", required = true),
      CredField("accountId", "string", required = true)),
    "hubspot" -> Seq(
      CredField("accessToken", "string", required = true, desc = "Hubspot API access token")),
    "intercom" -> Seq(
      CredField("accessToken", "string", required = true)),
    "resend" -> Seq(
      CredField("apiKey", "string", required = true, desc = "Resend API key")),
    "mixpanel" -> Seq(
      CredField("projectToken", "string", required = true),
      CredField("residency", "string", required = false,
        desc = "Data residency", enumVals = Seq("EU", "US")),
      CredField("batchSize", "integer", required = false),
      CredField("initialSyncDays", "integer", required = false),
      CredField("lookbackWindow", "integer", required = false)),
    "google-sheets" -> Seq(
      CredField("key", "any", required = true, desc = "Service-account key JSON")),
    "file" -> Seq(
      CredField("filePath", "string", required = true,
        desc = "Absolute path of file where to write data")),
    "http" -> Seq(
      CredField("url", "string", required = true, desc = "URL of HTTP endpoint"),
      CredField("method", "string", required = false,
        enumVals = Seq("GET", "POST", "PUT", "DELETE")),
      CredField("headers", "array", required = false,
        desc = "List of headers in format `key: value`"),
      CredField("format", "string", required = false,
        enumVals = Seq("ndjson", "json", "array")),
      CredField("body", "any", required = false, desc = "Request body template"),
      CredField("batchSize", "number", required = false),
      CredField("timeout", "number", required = false,
        desc = "Request timeout in milliseconds")))

  def credentialSchema(kind: String): Seq[CredField] =
    credentialSchemas.getOrElse(kind,
      throw new IllegalArgumentException(
        s"no credential schema for '$kind' (known: ${credentialSchemas.keys.toSeq.sorted.mkString(",")})"))

  /** Validate a parsed credentials object against the kind's schema
    * (the reference compiles the connector's JSON schema with ajv,
    * add.ts:72-92). Returns human-readable problems; empty = valid.
    * Unknown extra keys are rejected — a typo'd optional key silently
    * ignored is the classic mis-auth footgun. */
  def validateCredentials(kind: String, creds: Map[String, Any]): Seq[String] = {
    val schema = credentialSchema(kind)
    val byName = schema.map(f => f.name -> f).toMap
    val missing = schema.filter(f => f.required &&
      !creds.get(f.name).exists(v => v != null && v.toString.nonEmpty))
      .map(f => s"missing required credential '${f.name}'")
    val unknown = (creds.keySet -- byName.keySet).toSeq.sorted
      .map(k => s"unknown credential '$k' (schema has: ${schema.map(_.name).mkString(",")})")
    val badType = creds.toSeq.flatMap { case (k, v) =>
      byName.get(k).filter(_ => v != null).flatMap { f =>
        val ok = f.t match {
          case "string"  => v.isInstanceOf[String]
          case "integer" => v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
            v.isInstanceOf[java.math.BigInteger] || v.isInstanceOf[BigInt]
          case "number"  => v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
            v.isInstanceOf[Double] || v.isInstanceOf[java.math.BigDecimal] ||
            v.isInstanceOf[BigInt] || v.isInstanceOf[java.math.BigInteger]
          case "boolean" => v.isInstanceOf[Boolean]
          case "array"   => v.isInstanceOf[Seq[_]] || v.isInstanceOf[List[_]]
          case _         => true // "any"
        }
        val enumOk = f.enumVals.isEmpty || f.enumVals.contains(v.toString)
        if (!ok) Some(s"credential '$k' must be a ${f.t}, got ${v.getClass.getSimpleName}")
        else if (!enumOk) Some(s"credential '$k' must be one of ${f.enumVals.mkString("|")}, got '$v'")
        else None
      }
    }
    missing ++ unknown ++ badType
  }

  /** The kind's credential schema as draft-07 JSON (the `--json` face of
    * `destination` — destination.ts:57 prints the connector's schema). */
  def credentialSchemaJson(kind: String): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val fields = credentialSchema(kind)
    val props = fields.map { f =>
      val t = if (f.t == "any") "" else s""""type":"${f.t}""""
      val en = if (f.enumVals.isEmpty) "" else
        f.enumVals.map(v => s""""${esc(v)}"""").mkString(""""enum":[""", ",", "]")
      val d = if (f.desc.isEmpty) "" else s""""description":"${esc(f.desc)}""""
      s""""${esc(f.name)}":{${Seq(t, en, d).filter(_.nonEmpty).mkString(",")}}"""
    }.mkString(",")
    val req = fields.filter(_.required).map(f => s""""${esc(f.name)}"""").mkString(",")
    s"""{"$$schema":"http://json-schema.org/draft-07/schema#","type":"object","properties":{$props},"required":[$req]}"""
  }

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
