package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via `flatMapGroupsWithState` (SURVEY §2.9's
  * streaming extension; the `KeyValueGroupedDataset` state contract):
  * a running per-wallet balance folded over the event stream.
  *
  * The batch engine derives closing balances by re-aggregating history
  * (q19); the streaming engine instead carries one small state record
  * per wallet forward across micro-batches — O(wallets) state, each
  * micro-batch touching only the wallets present in it.
  *
  * Scale: state is partitioned by the group key across executors; with
  * watermark-based timeout (swap `NoTimeout` for `EventTimeTimeout`)
  * idle wallets age out, bounding state for unbounded key spaces.
  */
object StatefulBalance {

  final case class WalletEvent(user_id: Long, ts: Timestamp, value: Double)
  final case class WalletState(balance: Double, events: Long)
  final case class WalletUpdate(
      wallet_id: Long, balance: Double, events: Long)

  /** Fold one group's new events (sorted by event time for determinism)
    * into its carried state, emitting one update per event.
    */
  def foldGroup(
      walletId: Long,
      events: Iterator[WalletEvent],
      state: GroupState[WalletState]): Iterator[WalletUpdate] = {
    val prev = state.getOption.getOrElse(WalletState(0.0, 0L))
    var bal = prev.balance
    var n = prev.events
    val out = events.toSeq.sortBy(e => (e.ts.getTime, e.value)).map { e =>
      bal += e.value
      n += 1
      WalletUpdate(walletId, bal, n)
    }
    state.update(WalletState(bal, n))
    out.iterator
  }

  /** Streaming plan: file source → typed stream → stateful fold. */
  def runningBalances(spark: SparkSession,
      inputDir: String): Dataset[WalletUpdate] = {
    import spark.implicits._
    spark.readStream
      .schema(StreamingSummary.eventSchema)
      .parquet(inputDir)
      .filter($"event_type" =!= "error")
      .select($"user_id", $"ts", $"value")
      .as[WalletEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(foldGroup)
  }
}
