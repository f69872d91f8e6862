package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSummary

/** Structured Streaming variant: availableNow run over a file source must
  * reproduce the batch daily summary for all closed (watermark-passed)
  * windows.
  */
class StreamingSummarySpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("availableNow streaming summary matches the batch aggregate") {
    val base = Files.createTempDirectory("graft-stream").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    // stage events as a microsecond-timestamp parquet input
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    ev.write.parquet(in)
    val q = StreamingSummary.runAvailableNow(spark, in, ck, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    // batch equivalent over the same closed windows: append mode emits a
    // day window only once it ends at or before the final watermark
    // (maxTs - 1 day), i.e. date_key < date(maxTs - 1 day)
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val batch = ev.filter($"event_type" =!= "error")
      .filter(to_date($"ts") <
        to_date(lit(maxTs) - expr("INTERVAL 1 DAY")))
      .groupBy(to_date($"ts").as("date_key"), $"event_type".as("txn_type"))
      .agg(count(lit(1)).as("txn_count"))
    val s = streamed.select($"date_key".cast("string"), $"txn_type",
      $"txn_count").as[(String, String, Long)].collect().toSet
    val b = batch.select($"date_key".cast("string"), $"txn_type",
      $"txn_count").as[(String, String, Long)].collect().toSet
    assert(s == b)
    assert(s.nonEmpty)
  }
}
