package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.GraftSession
import graft.runner.CurationPipeline

/** Dev drive of the curated-corpus build over real test data: one
  * pipeline run (funnel → curated corpus → packing index), printing the
  * per-stage report and the verdict histogram.
  * Usage: runMain graft.tools.CurationDemo [sfDir]
  */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create("local[4]", 4, "graft-curationdemo")

    val wh = Files.createTempDirectory("graft-curation-demo").toString
    val report = new CurationPipeline(spark, wh).run(sfDir)
    println(s"[curation] warehouse: $wh")
    report.verdictCounts.toSeq.sortBy(-_._2).foreach { case (v, n) =>
      println(f"[curation]   $v%-12s $n%6d")
    }
    println(s"[curation] curated rows: ${report.curatedRows}")
    println(s"[curation] packed rows:  ${report.packedRows} " +
      s"(${report.boundarySplitDocs} split across sequence boundaries)")
    spark.stop()
  }
}
