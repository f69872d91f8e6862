package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSessionization

/** Streaming sessionization ≡ batch q44: the event-time-timeout
  * operator must emit exactly the sessions the batch window algebra
  * derives over the same events, once the watermark has passed far
  * enough to close them all.
  */
class StreamingSessionizationSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // wallets far outside the fixture's id space, used only to drag the
  // watermark forward so every real session times out and emits
  private val Sentinels = Set(10000001L, 10000002L)

  test("a sub-watermark late arrival extends the open session's start") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StreamingSessionization.{OpenSession, SessionEvent}
    // open session [1000s, 2000s]; a late event at 999s (allowed by the
    // watermark) arrives in the NEXT micro-batch. Its gap to end is
    // negative — inside the session's reach — so it must merge AND pull
    // start_us back, matching what batch q44 computes over sorted history
    val state = TestGroupState.create[OpenSession](
      Optional.of(OpenSession(1000000000L, 2000000000L, 2)),
      GroupStateTimeout.EventTimeTimeout,
      batchProcessingTimeMs = 0L,
      eventTimeWatermarkMs = Optional.of(0L),
      hasTimedOut = false)
    val late = SessionEvent(7L, new java.sql.Timestamp(999000L), 999000000L)
    val out = StreamingSessionization.onGroup(7L, Iterator(late), state)
    assert(out.isEmpty) // nothing closes — the session only widened
    assert(state.get == OpenSession(999000000L, 2000000000L, 3))
  }

  test("watermark-closed stream sessions equal the batch q44 sessions") {
    val base = Files.createTempDirectory("graft-ssess").toString
    val in = s"$base/in"
    // file 1: the real fixture events (one micro-batch — the in-batch
    // sort makes the fold order global). files 2..3: one far-future
    // sentinel each; each advances the watermark a batch later, so the
    // real wallets' last sessions time out and emit before the stream
    // drains (maxFilesPerTrigger=1 pins the batch-per-file cadence)
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    // ONE file (see StreamingEnrichmentSpec): each file is a
    // micro-batch under maxFilesPerTrigger=1, and the real data must
    // all precede the watermark-advancing sentinels
    ev.coalesce(1).write.parquet(s"$in/events.parquet")
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    def sentinel(id: Long, plusDays: Int) = Seq(
      (id * 10, new java.sql.Timestamp(
        maxTs.getTime + plusDays * 86400000L), id, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    sentinel(10000001L, 30).write.mode("append")
      .parquet(s"$in/events.parquet")
    sentinel(10000002L, 60).write.mode("append")
      .parquet(s"$in/events.parquet")

    val q = StreamingSessionization
      .sessionStream(spark, s"$in/events.parquet")
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("stream_sessions")
      .filter(!$"wallet_id".isin(Sentinels.toSeq: _*))
      .select($"wallet_id", $"start_us", $"end_us", $"n_events",
        $"duration_s")
      .collect().map(_.toString).sorted.toSeq
    // batch q44 over the same dir (the loader reads the micros
    // timestamps we wrote; sentinels excluded — their sessions are
    // still open, which is exactly the point of them)
    val expected = graft.models.ActivityModels.sessionization(spark, in)
      .filter(!$"wallet_id".isin(Sentinels.toSeq: _*))
      .select($"wallet_id", $"start_us", $"end_us", $"n_events",
        $"duration_s")
      .collect().map(_.toString).sorted.toSeq
    assert(got.nonEmpty)
    assert(got == expected)
  }
}
