package graft.model

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** B46: drift classification and the safe/halt rule per change kind. */
class SchemaDriftSpec extends AnyFunSuite {

  private def st(fs: (String, DataType, Boolean)*): StructType =
    StructType(fs.map { case (n, t, nl) => StructField(n, t, nl) })

  test("widening lattice") {
    assert(SchemaDrift.widens(IntegerType, LongType))
    assert(SchemaDrift.widens(FloatType, DoubleType))
    assert(SchemaDrift.widens(DateType, TimestampType))
    assert(SchemaDrift.widens(LongType, StringType))
    assert(SchemaDrift.widens(DecimalType(10, 2), DecimalType(18, 2)))
    assert(SchemaDrift.widens(IntegerType, DecimalType(12, 2)))
    assert(!SchemaDrift.widens(LongType, IntegerType))
    assert(!SchemaDrift.widens(DoubleType, FloatType))
    assert(!SchemaDrift.widens(DecimalType(18, 2), DecimalType(18, 4))) // int digits shrink
    assert(!SchemaDrift.widens(LongType, DecimalType(18, 0))) // 19 digits don't fit
    assert(SchemaDrift.widens(LongType, DecimalType(19, 0)))
    assert(!SchemaDrift.widens(StringType, LongType))
    assert(!SchemaDrift.widens(TimestampType, DateType))
  }

  test("per-column changes classify with the right safety verdicts") {
    val prev = st(("id", LongType, false), ("amt", IntegerType, true),
      ("old", StringType, true), ("note", StringType, true), ("req", LongType, true))
    val curr = st(("id", LongType, false), ("amt", LongType, true),
      ("fresh", StringType, true), ("note", StringType, false), ("req", LongType, true),
      ("must", LongType, false))
    val d = SchemaDrift.diff(prev, curr)
    val byKey = d.map(ch => (ch.column, ch.change) -> ch).toMap
    assert(byKey(("amt", "type_changed")).safe) // int → long widens
    assert(byKey(("fresh", "added")).safe) // nullable add
    assert(!byKey(("must", "added")).safe) // NOT NULL add can't backfill
    assert(!byKey(("old", "removed")).safe)
    assert(!byKey(("note", "nullability_changed")).safe) // tightened
    assert(d.size == 5)
    assert(!SchemaDrift.compatible(prev, curr))
  }

  test("identical and safely-evolved schemas are compatible") {
    val prev = st(("id", LongType, false), ("v", IntegerType, false))
    assert(SchemaDrift.compatible(prev, prev))
    val evolved = st(("id", LongType, false), ("v", LongType, false),
      ("extra", StringType, true))
    assert(SchemaDrift.compatible(prev, evolved))
    assert(SchemaDrift.diff(prev, evolved).map(_.action).forall(!_.startsWith("HALT")))
    // relaxing NOT NULL is safe in the other direction
    val relaxed = st(("id", LongType, true), ("v", IntegerType, false))
    assert(SchemaDrift.compatible(prev, relaxed))
  }
}
