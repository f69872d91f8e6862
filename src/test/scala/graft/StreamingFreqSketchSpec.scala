package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingFreqSketch

/** Streaming daily wallet sketches ≡ the batch daily layer over the
  * same closed days: exact stream lengths per day, and every emitted
  * heavy hitter's (estimate, lower_bound) brackets the exact per-day
  * wallet count.
  */
class StreamingFreqSketchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("availableNow sketch stream matches batch day sketches in bound") {
    val base = Files.createTempDirectory("graft-sfreq").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    ev.write.parquet(in)
    val q = StreamingFreqSketch.runAvailableNow(spark, in, ck, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out).cache()
    assert(streamed.count() > 0)
    // append mode emits only watermark-closed days
    val maxTs = ev.agg(max($"ts")).head().getTimestamp(0)
    val exactByDay = ev.filter($"event_type" =!= "error")
      .filter(to_date($"ts") < to_date(lit(maxTs) - expr("INTERVAL 1 DAY")))
      .groupBy(to_date($"ts").as("date_key"), $"user_id")
      .agg(count(lit(1)).as("true_count"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val dayTotals = exactByDay.groupBy(_._1._1).view.mapValues(_.values.sum)
    // per-day stream length is exact
    val streamedN = streamed
      .select($"date_key".cast("string"),
        call_function("freq_stream_n", $"sk_wallets"), $"txn_count")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(streamedN.map(_._1).sorted.toSeq == dayTotals.keys.toSeq.sorted)
    for ((day, n, cnt) <- streamedN) {
      assert(n == dayTotals(day), s"$day: stream length $n != exact")
      assert(cnt == dayTotals(day))
    }
    // every reported heavy hitter brackets its exact count
    val tops = streamed.select($"date_key".cast("string"),
      call_function("freq_top_k", $"sk_wallets", lit(5)).as("top"))
      .collect()
    for (row <- tops; hh <- row.getSeq[org.apache.spark.sql.Row](1)) {
      val t = exactByDay.getOrElse((row.getString(0), hh.getLong(0)), 0L)
      assert(t <= hh.getLong(1),
        s"${row.getString(0)}/${hh.getLong(0)}: estimate below exact")
      assert(hh.getLong(2) <= t,
        s"${row.getString(0)}/${hh.getLong(0)}: lower bound above exact")
    }
  }
}
