package graft.sync

/**
 * The reference's abort gate (core/src/lib/error-threshold.ts): a sync is
 * allowed scattered bad rows, but fails once invalid rows reach ≥20% of at
 * least 100 observed rows. Row-at-a-time there; here the counts come from
 * one distributed aggregation (or sink accumulators), and the gate is a
 * pure decision on the totals.
 */
final case class ErrorThreshold(ratioLimit: Double = 0.2, minRows: Long = 100) {
  def failed(valid: Long, invalid: Long): Boolean = {
    val total = valid + invalid
    total >= minRows && invalid.toDouble / total >= ratioLimit
  }

  /** Throws if the gate trips — mirrors the reference's sync abort. */
  def check(valid: Long, invalid: Long): Unit =
    if (failed(valid, invalid))
      throw new IllegalStateException(
        s"error threshold exceeded: $invalid invalid of ${valid + invalid} rows " +
          s"(limit ${(ratioLimit * 100).toInt}% over ≥$minRows)")
}
