package graft.sinks

import graft.SparkSuite
import org.apache.spark.sql.types._

class DestinationsSpec extends SparkSuite {
  import Destinations._

  private def schema(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  test("every registered destination has a resolvable default stream") {
    registry.values.foreach { d =>
      assert(d.streams.map(_.name).contains(d.defaultStream), d.kind)
    }
  }

  test("hubspot contacts: id unions accept longs, extras are custom attributes") {
    val fit = modelFit(schema(
      "id" -> LongType, "email" -> StringType, "tier" -> StringType), "hubspot")
    assert(fit.isEmpty, fit) // catchall: 'tier' becomes a custom attribute
  }

  test("missing required and mistyped columns are reported") {
    val fit = modelFit(schema(
      "id" -> LongType, "company_ids" -> ArrayType(BooleanType)), "hubspot")
    assert(fit.toSet == Set(
      MissingRequired("email"),
      TypeMismatch("company_ids", "id|id[]", "array<boolean>")))
  }

  test("facebook audience is not catchall: extra columns would be dropped") {
    val fit = modelFit(schema("email" -> StringType, "phone" -> StringType), "facebook-ads")
    assert(fit == Seq(DroppedExtra("phone")))
  }

  test("intercom dates accept timestamp, date, and string; booleans only booleans") {
    assert(modelFit(schema(
      "external_id" -> StringType, "email" -> StringType,
      "signed_up_at" -> TimestampType), "intercom").isEmpty)
    assert(modelFit(schema(
      "external_id" -> StringType, "email" -> StringType,
      "signed_up_at" -> StringType), "intercom").isEmpty)
    val bad = modelFit(schema(
      "external_id" -> StringType, "email" -> StringType,
      "unsubscribed_from_emails" -> StringType), "intercom")
    assert(bad == Seq(TypeMismatch("unsubscribed_from_emails", "boolean", "string")))
  }

  test("free-form streams (sheets/http/file) accept anything") {
    val s = schema("a" -> LongType, "b" -> ArrayType(StringType))
    Seq("google-sheets", "http", "file").foreach { k =>
      assert(modelFit(s, k).isEmpty, k)
    }
  }

  test("unknown destinations and streams fail loudly") {
    intercept[IllegalArgumentException](describe("salesforce"))
    intercept[IllegalArgumentException](
      modelFit(schema("email" -> StringType), "hubspot", Some("deals")))
  }
}
