package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — for each left row, attach the single most recent right row
 * of the same key with `rightTime` STRICTLY before `leftTime` (the classic
 * point-in-time / attribution join Spark has no native operator for).
 *
 * Spark-first formulation (per the extension preference order, this IS
 * expressible by composing built-ins, so no custom physical operator is
 * warranted): union both sides into one stream, then a single
 * key-partitioned window pass carries the last-seen right payload forward
 * (`last(..., ignoreNulls)` over rows between unbounded preceding and
 * current). Left rows sort BEFORE right rows at equal timestamps, which
 * yields the strict "<" semantics.
 *
 * Scale design (100 TB): exactly one shuffle (hash by key) + one sort per
 * partition — linear in |left|+|right|, no join blow-up. The naive
 * join-all-prior-then-argmax alternative materializes |left|×|matches|
 * intermediate rows; a range-bucketed join would need tuning per time
 * distribution. This shape needs neither. Skewed keys are AQE's problem
 * only if a single key exceeds a partition — the same boundary any
 * windowed analytic has.
 */
object AsOf {

  /**
   * @param left          probe side; all its columns are kept
   * @param right         reference side (pre-deduplicate equal (key, time)
   *                      rows for determinism)
   * @param keyCol        equality key present on both sides
   * @param leftTimeCol   left event-time column (comparable with right's)
   * @param rightTimeCol  right event-time column
   * @param rightValueCols right columns to attach
   * @param prefix        prefix for the attached columns (null when no
   *                      strictly-prior right row exists — LEFT join)
   */
  def joinPrior(left: DataFrame, right: DataFrame, keyCol: String,
                leftTimeCol: String, rightTimeCol: String,
                rightValueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightValueCols.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l = left.select(col(keyCol).as("__k"), col(leftTimeCol).as("__t"),
      lit(0).as("__isr"), lStruct.as("__l"), lit(null).cast(rType).as("__p"))
    val r = right.select(col(keyCol).as("__k"), col(rightTimeCol).as("__t"),
      lit(1).as("__isr"), lit(null).cast(lType).as("__l"), rStruct.as("__p"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t").asc, col("__isr").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)

    val outCols = left.columns.map(c => col(s"__l.$c").as(c)) ++
      rightValueCols.map(c => col(s"__asof.$c").as(s"$prefix$c"))
    matched.select(outCols: _*)
  }

  /** FORWARD as-of: the single EARLIEST right row of the same key with
    * `rightTime` strictly AFTER `leftTime` — the "next event" direction
    * (pandas merge_asof direction='forward'; time-reversed [[joinPrior]]).
    * Same single-shuffle window shape with the time order flipped; left
    * rows still sort before right rows at equal timestamps, which under
    * the DESCENDING order excludes equal-time rights — strict ">". */
  def joinForward(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTimeCol: String, rightTimeCol: String,
                  rightValueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(rightValueCols.map(col): _*)
    val lType = left.select(lStruct.as("s")).schema("s").dataType
    val rType = right.select(rStruct.as("s")).schema("s").dataType

    val l = left.select(col(keyCol).as("__k"), col(leftTimeCol).as("__t"),
      lit(0).as("__isr"), lStruct.as("__l"), lit(null).cast(rType).as("__p"))
    val r = right.select(col(keyCol).as("__k"), col(rightTimeCol).as("__t"),
      lit(1).as("__isr"), lit(null).cast(lType).as("__l"), rStruct.as("__p"))

    val w = Window.partitionBy("__k")
      .orderBy(col("__t").desc, col("__isr").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__isr") === 0)

    val outCols = left.columns.map(c => col(s"__l.$c").as(c)) ++
      rightValueCols.map(c => col(s"__asof.$c").as(s"$prefix$c"))
    matched.select(outCols: _*)
  }

  /** NEAREST as-of: whichever of the strictly-prior and strictly-after
    * matches sits closer in time; ties go to the PRIOR side (the
    * attribution-friendly convention — documented, deterministic).
    * Composes the two directional passes: one union frame, one shuffle,
    * two window sorts (ascending + descending) over the same exchange.
    * `rightTimeCol` must be among `rightValueCols` callers can compare —
    * it is attached automatically as `<prefix><rightTimeCol>`. */
  def joinNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTimeCol: String, rightTimeCol: String,
                  rightValueCols: Seq[String], prefix: String = "asof_"): DataFrame = {
    val vals = if (rightValueCols.contains(rightTimeCol)) rightValueCols
               else rightValueCols :+ rightTimeCol
    // both passes keep every left row exactly once, so the forward pass
    // runs directly ON the prior pass's output — no join-back needed
    val prior = joinPrior(left, right, keyCol, leftTimeCol, rightTimeCol, vals, "__pr_")
    val joined = joinForward(prior, right, keyCol, leftTimeCol, rightTimeCol, vals, "__fw_")
    val dPrior = col(leftTimeCol).cast("double") - col(s"__pr_$rightTimeCol").cast("double")
    val dFwd = col(s"__fw_$rightTimeCol").cast("double") - col(leftTimeCol).cast("double")
    val usePrior = col(s"__fw_$rightTimeCol").isNull ||
      (col(s"__pr_$rightTimeCol").isNotNull && dPrior <= dFwd)
    joined.select(
      left.columns.map(col) ++
        vals.map(c => when(usePrior, col(s"__pr_$c")).otherwise(col(s"__fw_$c")).as(s"$prefix$c")): _*)
  }
}
