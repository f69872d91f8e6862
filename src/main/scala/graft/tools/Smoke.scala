package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Dev smoke: replicates the driver's t1 check (SparkEntry.entry rows>0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4, "graft-smoke")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
  }
}
