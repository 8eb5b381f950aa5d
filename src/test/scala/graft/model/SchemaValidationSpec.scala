package graft.model

import graft.SparkSuite
import graft.state.StateStore
import graft.sync.SyncRunner
import org.apache.spark.sql.types._

/** B20 — validation rules generated from a declared row schema, and their
  * integration with the sync runner's error threshold. */
class SchemaValidationSpec extends SparkSuite {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("age", IntegerType, nullable = true,
      new MetadataBuilder().putDouble("minValue", 0.0).putDouble("maxValue", 150.0).build()),
    StructField("tier", StringType, nullable = true,
      new MetadataBuilder().putStringArray("enum", Array("free", "pro")).build()),
    StructField("code", StringType, nullable = true,
      new MetadataBuilder().putLong("maxLength", 4L).putString("pattern", "^[A-Z]+$").build())))

  private def frame = Seq(
    (Some(1L), "30", "free", "AB"),     // all good
    (None,     "31", "pro",  "CD"),     // id_required fails
    (Some(3L), "not-an-int", "pro", "EF"), // age_type fails
    (Some(4L), "200", "free", "GH"),    // age_max fails
    (Some(5L), "40", "gold", "IJ"),     // tier_enum fails
    (Some(6L), "41", "free", "TOOLONG"), // code_maxlen fails
    (Some(7L), "42", "pro",  "lower"),  // code_maxlen + code_pattern fail
    (Some(8L), null, null,   null)      // nulls pass all non-required rules
  ).toDF("id", "age", "tier", "code")

  test("generated rules: required / try_cast type / enum / range / len / pattern") {
    val counts = SchemaValidation.failureCounts(frame, schema).collect()(0)
    assert(counts.getAs[Long]("id_required") == 1)
    assert(counts.getAs[Long]("id_type") == 0)
    assert(counts.getAs[Long]("age_type") == 1, "uncastable string fails the rule, not the job")
    assert(counts.getAs[Long]("age_min") == 0)
    // '200' exceeds max; 'not-an-int' can't be compared — comparison casts
    // make it null, and null passes range rules
    assert(counts.getAs[Long]("age_max") == 1)
    assert(counts.getAs[Long]("tier_enum") == 1)
    assert(counts.getAs[Long]("code_maxlen") == 2)
    assert(counts.getAs[Long]("code_pattern") == 1)
  }

  test("schema rules plug into the sync runner and trip the threshold") {
    val m = Model("strict",
      s => frame,
      keyCols = Seq("id"),
      validations = SchemaValidation.rules(schema))
    val runner = new SyncRunner(StateStore.inMemory(),
      graft.sync.ErrorThreshold(ratioLimit = 0.10, minRows = 1))
    var sinkRan = false
    intercept[IllegalStateException] {
      runner.run(spark, m, "sv1", _ => sinkRan = true)
    }
    assert(!sinkRan, "threshold must gate the sink on schema violations")
  }
}
