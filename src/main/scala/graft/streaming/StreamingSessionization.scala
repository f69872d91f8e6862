package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SESSIONIZATION — the event-time-timeout twin of the batch
  * q44 operator (`ActivityModels.sessionization`): split each wallet's
  * live event stream into sessions wherever the inter-event gap exceeds
  * [[GapUs]], and EMIT a session exactly when the watermark proves no
  * event can reopen it.
  *
  * Batch q44 assigns sessions with a lag+running-sum window over
  * history; a stream can't wait for history, so the operator carries
  * ONE open-session record per wallet in `flatMapGroupsWithState`
  * state and uses `EventTimeTimeout` as the close signal: after a
  * wallet's last event, its timeout fires once the watermark passes
  * `end + gap` — the earliest moment the gap rule is decidable. This is
  * the `KeyValueGroupedDataset` custom-state contract at its most
  * canonical: bounded state (one record per live wallet), watermark-
  * driven eviction, append-mode emission of immutable results.
  *
  * Session boundary algebra runs in integer MICROSECONDS on a carried
  * `ts_us` column (the q44 drift-free idiom); the `Timestamp` column
  * rides along only because watermarks and timeouts speak event-time
  * milliseconds.
  *
  * Scale: state is hash-partitioned by wallet across executors and
  * bounded by (live wallets within the watermark horizon); each
  * micro-batch shuffles only its own events. A hot wallet concentrates
  * its own fold, never a cross-key product — same skew posture as the
  * batch window (SkewStressSpec).
  */
object StreamingSessionization {

  /** Same 6-hour gap as batch q44. */
  val GapUs: Long = 21600L * 1000000L

  final case class SessionEvent(user_id: Long, ts: Timestamp, ts_us: Long)
  final case class OpenSession(start_us: Long, end_us: Long, n: Long)
  final case class Session(
      wallet_id: Long, start_us: Long, end_us: Long,
      n_events: Long, duration_s: Long)

  private def close(walletId: Long, s: OpenSession): Session =
    Session(walletId, s.start_us, s.end_us, s.n,
      (s.end_us - s.start_us) / 1000000L)

  /** Fold one wallet's micro-batch into its open session, emitting
    * every session the new events (or the timeout) prove closed.
    */
  def onGroup(
      walletId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // watermark passed end + gap with no new events: the session is
      // closed by the gap rule, emit and clear
      val closed = close(walletId, state.get)
      state.remove()
      Iterator(closed)
    } else {
      val sorted = events.toSeq.sortBy(_.ts_us)
      val out = scala.collection.mutable.ListBuffer.empty[Session]
      var cur = state.getOption
      sorted.foreach { e =>
        cur = cur match {
          case Some(s) if e.ts_us - s.end_us <= GapUs =>
            // A sub-watermark late arrival may PREDATE the open session's
            // start (negative gap passes the guard by design — it is
            // within the session's reach); extend the start too so the
            // emitted (start_us, duration_s) matches what batch q44
            // computes over the fully-sorted history. Reordering beyond
            // the 1-minute watermark is dropped upstream by Spark and can
            // still shift a session start by up to the watermark delay —
            // the documented stream-vs-batch divergence bound.
            Some(OpenSession(math.min(s.start_us, e.ts_us),
              math.max(s.end_us, e.ts_us), s.n + 1))
          case Some(s) =>
            out += close(walletId, s)
            Some(OpenSession(e.ts_us, e.ts_us, 1))
          case None =>
            Some(OpenSession(e.ts_us, e.ts_us, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        // the gap rule becomes decidable at end + gap (event time)
        state.setTimeoutTimestamp(s.end_us / 1000L + GapUs / 1000L)
      }
      out.iterator
    }
  }

  /** Streaming plan: file source → watermark → per-wallet stateful
    * sessionizer (unstarted — caller picks sink/trigger). */
  def sessionStream(spark: SparkSession,
      inputDir: String): Dataset[Session] = {
    import spark.implicits._
    spark.readStream
      .schema(StreamingSummary.eventSchema)
      .option("maxFilesPerTrigger", "1") // deterministic batch-per-file
      .parquet(inputDir)
      .filter($"event_type" =!= "error")
      .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"))
      .withWatermark("ts", "1 minute")
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onGroup)
  }
}
