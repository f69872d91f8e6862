package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Dev tool: print the formatted physical plan of one or more queries —
  * for checking PushedFilters / ReadSchema / broadcast choices /
  * WholeStageCodegen spans. Usage: runMain graft.tools.Explain q01_fact_txn …
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create("local[4]", 4, "graft-explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
