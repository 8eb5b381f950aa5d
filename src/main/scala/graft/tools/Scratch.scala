package graft.tools

import graft.GraftSession
import graft.queries.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev scratchpad: time individual pipeline stages while tuning. Body
  * changes freely between experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val t = Tables(spark, sfDir)

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    t.lineitem.count() // warm FS cache
    println("lineitem schema: " + t.lineitem.schema.simpleString)

    val Dec = DecimalType(18, 2)
    val fil = t.lineitem.filter(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))

    for (i <- 1 to 3) {
      time(s"q1 decimal #$i")(noop(
        fil.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
               sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base"),
               sum((col("l_extendedprice").cast(Dec) * (lit(1).cast(Dec) - col("l_discount").cast(Dec))).cast(Dec)).as("disc"),
               count(lit(1)).as("n"))))
      time(s"q1 double #$i")(noop(
        fil.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("l_quantity")).as("sum_qty"),
               sum(col("l_extendedprice")).as("sum_base"),
               sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("disc"),
               count(lit(1)).as("n"))))
      time(s"q1 long-cents #$i")(noop(
        fil.groupBy("l_returnflag", "l_linestatus")
          .agg(sum(round(col("l_quantity") * 100).cast("long")).as("sum_qty_c"),
               sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_c"),
               sum(round(col("l_extendedprice") * 100).cast("long") *
                   (lit(10000L) - round(col("l_discount") * 10000).cast("long"))).as("disc_e6"),
               count(lit(1)).as("n"))))
      time(s"scan only #$i")(noop(
        fil.select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount")))
    }
    spark.stop()
  }
}
