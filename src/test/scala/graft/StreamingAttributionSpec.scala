package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingAttribution

/** Streaming last-touch attribution ≡ batch q45: the watermark-gated
  * stateful operator must emit exactly the attributions the batch
  * carry-forward window derives over the same events, once the
  * watermark has passed far enough to finalize them all — plus the
  * tie/window boundary algebra on a TestGroupState.
  */
class StreamingAttributionSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val Sentinels = Set(10000001L, 10000002L)

  test("boundary algebra: ties attribute, window edges hold, state GCs") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StreamingAttribution.{AttrEvent, AttrState, WindowUs}
    def ev(us: Long, id: Long, click: Boolean) =
      AttrEvent(7L, new java.sql.Timestamp(us / 1000L), us, id, click)
    // clicks at t=1000s (ids 5 then 9 — same ts, max wins) and a
    // purchase at exactly t=1000s: the tie attributes to id 9
    val s1 = TestGroupState.create[AttrState](
      Optional.empty(), GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(2000000L), // wm = 2000s
      hasTimedOut = false)
    val out1 = StreamingAttribution.onGroup(7L, Iterator(
      ev(1000000000L, 5L, click = true),
      ev(1000000000L, 9L, click = true),
      ev(1000000000L, 42L, click = false)), s1).toSeq
    assert(out1.map(a => (a.purchase_event_id, a.click_event_id,
      a.gap_us)) == Seq((42L, 9L, 0L)))
    // the surviving state: one dominated-newest click, no pending
    assert(s1.get == AttrState(Seq((1000000000L, 9L)), Seq.empty))

    // a purchase exactly at the window edge attributes; one µs past
    // the edge does not (both decidable at this watermark)
    val s2 = TestGroupState.create[AttrState](
      Optional.of(AttrState(Seq((0L, 1L)), Seq.empty)),
      GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(WindowUs / 1000L + 10000L),
      hasTimedOut = false)
    val out2 = StreamingAttribution.onGroup(7L, Iterator(
      ev(WindowUs, 50L, click = false),
      ev(WindowUs + 1L, 51L, click = false)), s2).toSeq
    assert(out2.map(_.purchase_event_id) == Seq(50L))
    // the click is now beyond every future purchase's reach → GC'd,
    // nothing pending → state fully removed
    assert(!s2.exists)
  }

  test("watermark-finalized stream attributions equal the batch q45 rows") {
    val base = Files.createTempDirectory("graft-sattr").toString
    val in = s"$base/in"
    // file 1: the full fixture in one micro-batch; files 2..3: one
    // far-future sentinel CLICK each (clicks pass the stream's type
    // filter, so each advances the watermark a batch later and fires
    // the pending-purchase timeouts; they never emit — no purchases)
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    ev.coalesce(1).write.parquet(s"$in/events.parquet")
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    def sentinel(id: Long, plusDays: Int) = Seq(
      (id * 10, new java.sql.Timestamp(
        maxTs.getTime + plusDays * 86400000L), id, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    sentinel(10000001L, 30).write.mode("append")
      .parquet(s"$in/events.parquet")
    sentinel(10000002L, 60).write.mode("append")
      .parquet(s"$in/events.parquet")

    val q = StreamingAttribution
      .attributionStream(spark, s"$in/events.parquet")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_attr")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val cols = Seq("wallet_id", "purchase_event_id", "purchase_ts_us",
      "click_event_id", "click_ts_us", "gap_us")
    val got = spark.table("stream_attr")
      .filter(!$"wallet_id".isin(Sentinels.toSeq: _*))
      .select(cols.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    val expected = graft.models.ActivityModels
      .lastTouchAttribution(spark, in)
      .filter(!$"wallet_id".isin(Sentinels.toSeq: _*))
      .select(cols.map(col): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty)
    assert(got == expected)
  }
}
