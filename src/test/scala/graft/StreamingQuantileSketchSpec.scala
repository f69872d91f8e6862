package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{QuantileModels, TxnModels}
import graft.streaming.StreamingModelRunner

/** The quantile tier's streaming twin
  * (`StreamingModelRunner.dailyAmountSketchesStream`): a catch-up run
  * must emit the batch daily KLL layer's closed days with exact
  * per-(day, app) stream lengths, and — because the fixture's groups sit
  * under the sketch's k, where KLL is exact — value-identical
  * percentile reads.
  */
class StreamingQuantileSketchSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("catch-up KLL stream matches the batch daily layer") {
    val base = Files.createTempDirectory("graft-skll").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    // one file = one micro-batch: in-batch dedup ≡ batch dropDuplicates
    ev.coalesce(1).write.parquet(in)
    StreamingModelRunner.catchUp(
      spark, "daily_amount_sketches", in, ck, out).awaitTermination()
    val streamed = spark.read.parquet(out).cache()
    assert(streamed.count() > 0)
    val batch = QuantileModels.dailyAmountSketches(
      TxnModels.factTxnFrom(spark.read.parquet(in))).cache()
    def reads(df: org.apache.spark.sql.DataFrame) = df.select(
      $"date_key".cast("string").as("d"), $"app_id", $"txn_count",
      call_function("kll_sketch_n", $"sk_amount").as("n"),
      call_function("kll_value_at", $"sk_amount", lit(0.5d)).as("p50"),
      call_function("kll_value_at", $"sk_amount", lit(0.99d)).as("p99"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val sRows = reads(streamed)
    val bRows = reads(batch)
    // append mode emits only watermark-closed days: streamed keys are a
    // nonempty subset of the batch grain
    assert(sRows.nonEmpty && sRows.keySet.subsetOf(bRows.keySet))
    for ((key, (cnt, n, p50, p99)) <- sRows) {
      val (bCnt, bN, bP50, bP99) = bRows(key)
      assert(cnt == bCnt && n == bN && n == cnt, s"$key: stream length")
      // every fixture group is far below k=200, so both sketches are
      // EXACT and order-insensitive — percentiles must match bitwise.
      // (A group ever outgrowing k would demote this to the rank-error
      // band; guard that assumption explicitly.)
      assert(n <= graft.functions.KllQuantile.DefaultK,
        s"$key: fixture group outgrew k — update this spec's contract")
      assert(p50 == bP50 && p99 == bP99, s"$key: exact-region mismatch")
    }
  }
}
