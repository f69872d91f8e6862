package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LAST-TOUCH ATTRIBUTION — the watermark-gated twin of the
  * batch q45 operator (`ActivityModels.lastTouchAttribution`): each
  * purchase is attributed to the same wallet's most recent click
  * at-or-before it within [[WindowUs]], and EMITS exactly when the
  * watermark proves no earlier click can still arrive.
  *
  * Batch q45 carries the last click forward with one per-wallet ordered
  * window; a stream can't see history-at-once, so the operator holds
  * per-wallet custom state in `flatMapGroupsWithState`:
  *
  *  - `clicks`  — the candidate click set, PRUNED to (all clicks above
  *    the watermark) + (the single newest click at-or-below it, kept
  *    only while a future purchase could still reach it): any older
  *    click is dominated for every not-yet-decidable purchase, so state
  *    is bounded by the watermark horizon, not history;
  *  - `pending` — purchases whose attribution is not yet final: a
  *    purchase decides only once the watermark passes its timestamp
  *    (then every click ≤ it has either arrived or been dropped as
  *    too-late upstream — the emission is immutable).
  *
  * `EventTimeTimeout` is the wake-up signal: the earliest pending
  * purchase arms the clock, and a final timeout at `click + window`
  * garbage-collects the last candidate once nothing can use it —
  * a fully-drained wallet leaves NO state behind.
  *
  * All boundary algebra runs in integer microseconds on a carried
  * `ts_us` (the q44/q45 drift-free idiom); same-timestamp clicks
  * collapse to max event_id at insert (the batch tie rule), and a
  * click at exactly a purchase's timestamp attributes (at-or-before
  * includes ties).
  *
  * Scale: state is hash-partitioned by wallet and bounded by (clicks
  * within the watermark horizon + pending purchases per wallet); each
  * micro-batch shuffles only its own events — the same posture as the
  * sessionization twin.
  */
object StreamingAttribution {

  /** Same 7-day window as batch q45. */
  val WindowUs: Long = 7L * 24 * 3600 * 1000000L

  final case class AttrEvent(
      user_id: Long, ts: Timestamp, ts_us: Long, event_id: Long,
      is_click: Boolean)
  /** (ts_us, event_id) pairs; clicks ascending and unique per ts. */
  final case class AttrState(
      clicks: Seq[(Long, Long)], pending: Seq[(Long, Long)])
  final case class Attribution(
      wallet_id: Long, purchase_event_id: Long, purchase_ts_us: Long,
      click_event_id: Long, click_ts_us: Long, gap_us: Long)

  /** Fold one wallet's micro-batch (empty on a timeout wake-up) into
    * its state, emitting every attribution the watermark proves final. */
  def onGroup(
      walletId: Long,
      events: Iterator[AttrEvent],
      state: GroupState[AttrState]): Iterator[Attribution] = {
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val prev = state.getOption.getOrElse(AttrState(Seq.empty, Seq.empty))
    val evs = events.toSeq
    // merge clicks, collapsing same-ts duplicates to max event_id
    val byTs = scala.collection.mutable.Map.empty[Long, Long]
    (prev.clicks ++ evs.filter(_.is_click)
      .map(e => (e.ts_us, e.event_id))).foreach { case (t, id) =>
      byTs(t) = math.max(byTs.getOrElse(t, Long.MinValue), id)
    }
    val clicks = byTs.toSeq.sortBy(_._1)
    val pending = (prev.pending ++ evs.filterNot(_.is_click)
      .map(e => (e.ts_us, e.event_id))).sorted
    // a purchase is final once the watermark passes it STRICTLY (a
    // click at exactly the watermark could still arrive and tie)
    val (decidable, stillPending) = pending.partition(_._1 < wmUs)
    val out = decidable.flatMap { case (pts, pid) =>
      clicks.takeWhile(_._1 <= pts).lastOption.collect {
        case (cts, cid) if pts - cts <= WindowUs =>
          Attribution(walletId, pid, pts, cid, cts, pts - cts)
      } // no click / out-of-window → unattributed, drops (batch ≡)
    }
    // prune: sub-watermark clicks are dominated by the newest of them;
    // that one survives only while a future purchase could reach it
    val (old, fresh) = clicks.partition(_._1 <= wmUs)
    val kept = old.lastOption
      .filter { case (cts, _) => wmUs <= cts + WindowUs }.toSeq ++ fresh
    if (stillPending.isEmpty && kept.isEmpty) {
      state.remove()
    } else {
      state.update(AttrState(kept, stillPending))
      val nextUs =
        if (stillPending.nonEmpty) stillPending.map(_._1).min
        else kept.map { case (cts, _) => cts + WindowUs }.max
      state.setTimeoutTimestamp(nextUs / 1000L + 1)
    }
    out.iterator
  }

  /** Streaming plan: file source → watermark → per-wallet stateful
    * attribution (unstarted — caller picks sink/trigger). */
  def attributionStream(spark: SparkSession,
      inputDir: String): Dataset[Attribution] = {
    import spark.implicits._
    spark.readStream
      .schema(StreamingSummary.eventSchema)
      .option("maxFilesPerTrigger", "1") // deterministic batch-per-file
      .parquet(inputDir)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"ts", unix_micros($"ts").as("ts_us"),
        $"event_id", ($"event_type" === "click").as("is_click"))
      .withWatermark("ts", "1 minute")
      .as[AttrEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(onGroup)
  }
}
