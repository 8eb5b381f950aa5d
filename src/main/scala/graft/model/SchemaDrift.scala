package graft.model

import org.apache.spark.sql.types._

/**
 * B46: schema DRIFT detection — the metadata half of B3's snapshot diff:
 * before the rows of a new snapshot generation are diffed, the SCHEMAS
 * are, so a destination can evolve (or a sync can halt loudly) instead of
 * failing row-by-row mid-push. The reference's destinations carry typed
 * stream schemas (the rowType/streams declarations the connectors
 * publish); this computes what changed between the schema a destination
 * was created from and the schema the model produces today, and whether
 * each change is SAFE to auto-apply:
 *
 *  - `added` — new column; safe iff nullable (a required column can't be
 *    backfilled for already-delivered rows);
 *  - `removed` — column gone; never auto-safe (destination data loss);
 *  - `type_changed` — safe iff the move is a lossless WIDENING
 *    (byte→short→int→long, float→double, integer→decimal/double with
 *    room, decimal precision up at the same scale, date→timestamp,
 *    anything→string); narrowings and cross-family moves are flagged;
 *  - `nullability_changed` — relaxing required→nullable is safe, the
 *    reverse is not (existing nulls would violate it).
 *
 * Pure driver-side metadata work — schemas are O(#columns), no data is
 * scanned; the result frame exists so the plan lands in the same sync-run
 * reporting tables as everything else.
 */
object SchemaDrift {

  final case class Change(column: String, change: String,
                          prevType: Option[String], currType: Option[String],
                          safe: Boolean, action: String)

  /** Is `from → to` a lossless widening? */
  def widens(from: DataType, to: DataType): Boolean = (from, to) match {
    case (a, b) if a == b => true
    case (ByteType, ShortType | IntegerType | LongType) => true
    case (ShortType, IntegerType | LongType) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (ByteType | ShortType | IntegerType, DoubleType) => true
    case (ByteType | ShortType | IntegerType | LongType, d: DecimalType) =>
      // an n-digit integral needs precision − scale ≥ digits(max)
      val digits = from match {
        case ByteType => 3; case ShortType => 5; case IntegerType => 10; case _ => 19
      }
      d.precision - d.scale >= digits
    case (a: DecimalType, b: DecimalType) =>
      b.scale >= a.scale && b.precision - b.scale >= a.precision - a.scale
    case (DateType, TimestampType) => true
    case (_, StringType) => true
    case _ => false
  }

  /** Per-column drift between two schemas (order-insensitive; column
    * names are the identity, matching the sync key-mapping contract). */
  def diff(prev: StructType, curr: StructType): Seq[Change] = {
    val p = prev.fields.map(f => f.name -> f).toMap
    val c = curr.fields.map(f => f.name -> f).toMap
    val added = curr.fields.filterNot(f => p.contains(f.name)).map { f =>
      Change(f.name, "added", None, Some(f.dataType.sql),
        safe = f.nullable,
        action = if (f.nullable) s"ADD COLUMN ${f.name} ${f.dataType.sql}"
                 else s"HALT: added column ${f.name} is NOT NULL — cannot backfill")
    }
    val removed = prev.fields.filterNot(f => c.contains(f.name)).map { f =>
      Change(f.name, "removed", Some(f.dataType.sql), None, safe = false,
        action = s"HALT: column ${f.name} removed — destination would lose data")
    }
    val common = prev.fields.filter(f => c.contains(f.name)).flatMap { pf =>
      val cf = c(pf.name)
      val ty =
        if (pf.dataType != cf.dataType) {
          val safe = widens(pf.dataType, cf.dataType)
          Some(Change(pf.name, "type_changed",
            Some(pf.dataType.sql), Some(cf.dataType.sql), safe,
            action = if (safe) s"ALTER COLUMN ${pf.name} TYPE ${cf.dataType.sql}"
                     else s"HALT: ${pf.name} ${pf.dataType.sql} → ${cf.dataType.sql} is lossy"))
        } else None
      val nu =
        if (pf.nullable != cf.nullable) {
          val safe = cf.nullable // required → nullable relaxes; reverse can't hold
          Some(Change(pf.name, "nullability_changed",
            Some(if (pf.nullable) "NULL" else "NOT NULL"),
            Some(if (cf.nullable) "NULL" else "NOT NULL"), safe,
            action = if (safe) s"ALTER COLUMN ${pf.name} DROP NOT NULL"
                     else s"HALT: ${pf.name} tightened to NOT NULL — existing rows may violate"))
        } else None
      ty.toSeq ++ nu
    }
    (added ++ removed ++ common).sortBy(ch => (ch.column, ch.change))
  }

  /** True iff every drift item can be auto-applied. */
  def compatible(prev: StructType, curr: StructType): Boolean =
    diff(prev, curr).forall(_.safe)
}
