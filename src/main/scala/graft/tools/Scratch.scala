package graft.tools

import graft.GraftSession

/** Dev scratchpad: time individual pipeline stages while tuning. Body
  * changes freely between experiments; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($r)")
    }

    time("session up")(spark.version)
    spark.stop()
  }
}
