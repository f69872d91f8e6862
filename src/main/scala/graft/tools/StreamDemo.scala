package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.streaming.StreamingSummary

/** Dev drive of the Structured Streaming path: stage the events fixture as
  * a file-source input, run the daily summary with Trigger.AvailableNow,
  * and print what was emitted. Usage: runMain graft.tools.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Files.createTempDirectory("graft-stream-demo").toString
    val in = s"$base/in"
    graft.catalog.Tables.events(spark, sfDir).write.parquet(in)
    val q = StreamingSummary.runAvailableNow(spark, in, s"$base/ck", s"$base/out")
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
    println(s"[stream] emitted rows=${out.count()} " +
      s"days=${out.select($"date_key").distinct().count()}")
    out.orderBy($"date_key", $"txn_type").show(6)
    spark.stop()
  }
}
