package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{FreqModels, TxnModels}
import graft.streaming.StreamingModelRunner

/** The heavy-hitters tier's streaming twin
  * (`StreamingModelRunner.dailyWalletFreqSketchesStream`, registered
  * beside the other model twins): a catch-up run must emit the batch
  * daily layer's closed days with exact per-day stream lengths, and
  * every reported heavy hitter must bracket its exact fact count.
  */
class StreamingFreqSketchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("catch-up sketch stream matches the batch daily layer in bound") {
    val base = Files.createTempDirectory("graft-sfreq").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    // one file = one micro-batch: the in-batch dedup matches the batch
    // fact's global dropDuplicates("event_id")
    ev.coalesce(1).write.parquet(in)
    StreamingModelRunner.catchUp(
      spark, "daily_wallet_freq_sketches", in, ck, out).awaitTermination()
    val streamed = spark.read.parquet(out).cache()
    assert(streamed.count() > 0)
    // batch layer 1 over the same staged events, fact semantics included
    val batchDaily = FreqModels.dailyWalletFreqSketches(
      TxnModels.factTxnFrom(spark.read.parquet(in)))
      .select($"date_key".cast("string").as("d"), $"txn_count").cache()
    val streamedN = streamed
      .select($"date_key".cast("string"),
        call_function("freq_stream_n", $"sk_wallets"), $"txn_count")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // append mode emits only watermark-closed days: the streamed day
    // set is a nonempty prefix of the batch day set, exact counts on it
    val batchByDay = batchDaily.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((day, n, cnt) <- streamedN) {
      assert(batchByDay(day) == n, s"$day: stream length $n != batch")
      assert(cnt == n)
    }
    assert(streamedN.map(_._1).toSet.subsetOf(batchByDay.keySet))
    // heavy hitters bracket the exact per-(day, wallet) fact counts
    val exact = TxnModels.factTxnFrom(spark.read.parquet(in))
      .groupBy($"date_key".cast("string").as("d"), $"wallet_id")
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val tops = streamed.select($"date_key".cast("string"),
      call_function("freq_top_k", $"sk_wallets", lit(5)).as("top"))
      .collect()
    for (row <- tops; hh <- row.getSeq[org.apache.spark.sql.Row](1)) {
      val t = exact.getOrElse((row.getString(0), hh.getLong(0)), 0L)
      assert(t <= hh.getLong(1),
        s"${row.getString(0)}/${hh.getLong(0)}: estimate below exact")
      assert(hh.getLong(2) <= t,
        s"${row.getString(0)}/${hh.getLong(0)}: lower bound above exact")
    }
  }
}
