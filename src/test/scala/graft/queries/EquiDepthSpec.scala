package graft.queries

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A35: the two-level distributed equi-depth histogram must equal the one
  * global rank window, and its buckets must actually be equi-DEPTH. */
class EquiDepthSpec extends SparkSuite {
  import spark.implicits._

  private lazy val t = Tables(spark, sfDir)

  test("equi-depth buckets are balanced and bounds are ordered, equal to the global window") {
    val k = 16
    val got = Relational.q148EquiDepth(t)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val n = got.map(_._2).sum
    // depth balance: every bucket holds n div k or n div k + 1 rows
    assert(got.size == k)
    assert(got.map(_._1) == (0L until k.toLong), "buckets 0..k-1, none empty")
    got.foreach { case (b, rows, _, _) =>
      assert(rows == n / k || rows == n / k + 1, s"bucket $b depth $rows (n=$n)")
    }
    // bounds tile the value axis in order (hi of b <= lo of b+1)
    got.sliding(2).foreach {
      case Seq((_, _, _, hi), (_, _, lo, _)) => assert(hi <= lo)
      case _ => ()
    }
    // the two-level rank equals one global ROW_NUMBER bucket assignment
    val cents = (Q.dec(col("l_extendedprice")) * 100).cast("long")
    val base = t.lineitem.select(cents.as("c"),
      col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
    val global = base
      .withColumn("rn", row_number().over(
        Window.orderBy(col("c"), col("ok"), col("ln"))).cast("long"))
      .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
      .select(expr(s"(rn - 1) * $k div n").as("bucket"), col("c"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col("c")).as("lo_cents"), max(col("c")).as("hi_cents"))
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == global, "two-level form must equal the global window")
  }
}
