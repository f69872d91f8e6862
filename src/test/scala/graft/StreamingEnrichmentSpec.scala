package graft

import java.nio.file.Files
import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingEnrichment

/** Stream-stream as-of enrichment ≡ the same join run in batch: every
  * real event must come out exactly once, priced by the latest tick
  * within its lookback, once sentinel rows drag both watermarks past
  * the real data.
  */
class StreamingEnrichmentSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val SentinelId = 99999999L

  test("streamed as-of enrichment equals the batch join over the same files") {
    val base = Files.createTempDirectory("graft-senrich").toString
    val evDir = s"$base/ev"; val tkDir = s"$base/tk"
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" =!= "error").limit(300).cache()
    // ONE file: under maxFilesPerTrigger=1 each file is a micro-batch,
    // and a later file holding earlier timestamps would fall behind the
    // watermark batch 1 set — the real data must arrive as one batch
    ev.coalesce(1).write.parquet(evDir)
    val bounds = ev.agg(min($"ts"), max($"ts")).head()
    val (minTs, maxTs) = (bounds.getTimestamp(0), bounds.getTimestamp(1))
    // a tick every 6 hours across the event calendar (plus one before
    // the first event so every event has a governing tick)
    val ticks = (0 to
      ((maxTs.getTime - minTs.getTime) / 21600000L).toInt + 1)
      .map(i => (new Timestamp(minTs.getTime - 21600000L + i * 21600000L),
        100.0 + i))
      .toDF("tick_ts", "price")
    ticks.coalesce(1).write.parquet(tkDir)
    // sentinels: one far-future row per side (two files each → the
    // watermark advances batch over batch under maxFilesPerTrigger=1)
    for (plusDays <- Seq(40, 80)) {
      Seq((SentinelId + plusDays, new Timestamp(
        maxTs.getTime + plusDays * 86400000L), SentinelId, "view", 0.0, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(evDir)
      Seq((new Timestamp(maxTs.getTime + plusDays * 86400000L), 0.0))
        .toDF("tick_ts", "price")
        .write.mode("append").parquet(tkDir)
    }

    val q = StreamingEnrichment.enrichedEvents(spark, evDir, tkDir)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("enriched")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("enriched")
      .filter($"user_id" =!= SentinelId)
      .select($"event_id", $"asof_price", $"asof_tick_ts")
      .collect().map(_.toString).sorted.toSeq
    // batch reference: identical join + latest-tick aggregate
    val batch = spark.read.parquet(evDir)
      .filter($"event_type" =!= "error" && $"user_id" =!= SentinelId)
      .join(spark.read.parquet(tkDir),
        $"tick_ts" <= $"ts" &&
          $"tick_ts" >= $"ts" - expr("INTERVAL 1 DAY"))
      .groupBy($"event_id", $"ts", $"user_id", $"value")
      .agg(max_by($"price", $"tick_ts").as("asof_price"),
        max($"tick_ts").as("asof_tick_ts"))
      .select($"event_id", $"asof_price", $"asof_tick_ts")
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty)
    assert(got == batch)
    // every real event enriched exactly once
    assert(got.size == ev.count())
  }
}
