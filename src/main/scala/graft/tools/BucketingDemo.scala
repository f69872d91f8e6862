package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.GraftSession

/** Dev drive: bucketed tables make the fact⋈fact join shuffle-free.
  *
  * At 100 TB the orders⋈customer (or lineitem⋈orders) join would shuffle
  * both sides on every run; writing both bucketed by the join key lets
  * SortMergeJoin read co-located buckets with NO Exchange. This demo
  * writes both tables bucketed, joins, and prints whether the physical
  * plan contains an Exchange under the join.
  * Usage: runMain graft.tools.BucketingDemo [sfDir]
  */
object BucketingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val wh = Files.createTempDirectory("graft-bucket-wh").toString
    val spark = GraftSession.install(GraftSession.configure(
      SparkSession.builder().master("local[8]")
        .appName("graft-bucketingdemo"), 8)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    graft.catalog.Tables.orders(spark, sfDir)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    graft.catalog.Tables.customer(spark, sfDir)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    println(s"[bucketing] rows=${joined.count()} " +
      s"exchanges_in_plan=$exchanges " +
      s"${if (exchanges == 0) "SHUFFLE-FREE" else "SHUFFLED"}")

    // contrast: the same join over plain parquet shuffles both sides
    val plain = graft.catalog.Tables.orders(spark, sfDir)
      .join(graft.catalog.Tables.customer(spark, sfDir),
        $"o_custkey" === $"c_custkey")
    val plainEx = plain.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    println(s"[plain] exchanges_in_plan=$plainEx")
    spark.stop()
  }
}
