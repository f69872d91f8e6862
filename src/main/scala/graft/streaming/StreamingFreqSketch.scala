package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming twin of the heavy-hitters tier's DAILY LAYER
  * (`FreqModels.dailyWalletFreqSketches`): per-day wallet-activity
  * sketches built continuously from the live event stream, emitted when
  * the watermark closes each day — so the rolling layer
  * (`FreqModels.rollingFromSketches`) reads an always-current sketch
  * table instead of waiting for the nightly batch append.
  *
  * Works unmodified in streaming because the sketch aggregate is a
  * `TypedImperativeAggregate`: the state store holds each open day's
  * serialized sketch (≤8 KB per window — the fixed-size summary is
  * exactly what makes per-key streaming state affordable), updates
  * partial-aggregate map-side per micro-batch, and append mode emits a
  * day's finished sketch row once the watermark passes it — the same
  * closed-period discipline as the batch runner's watermark gate.
  *
  * Scale: state is bounded by (watermark horizon × 1 row) per day, not
  * by distinct wallets — the sketch absorbs the key cardinality. The
  * per-micro-batch shuffle is one hash agg keyed by day.
  */
object StreamingFreqSketch {

  /** The streaming daily wallet-sketch plan (unstarted). Mirrors
    * `FreqModels.dailyWalletFreqSketches` column-for-column so the
    * rolling layer can read either materialization. */
  def dailySketchStream(spark: SparkSession, inputDir: String): DataFrame = {
    import spark.implicits._
    spark.readStream
      .schema(StreamingSummary.eventSchema)
      .parquet(inputDir)
      .filter($"event_type" =!= "error")
      .withWatermark("ts", "1 day")
      .groupBy(window($"ts", "1 day").as("day_window"))
      .agg(
        call_function("freq_sketch_agg", $"user_id").as("sk_wallets"),
        count($"user_id").as("txn_count"))
      .select($"day_window.start".cast("date").as("date_key"),
        $"sk_wallets", $"txn_count")
  }

  def runAvailableNow(spark: SparkSession, inputDir: String,
      checkpointDir: String, outDir: String): StreamingQuery =
    dailySketchStream(spark, inputDir).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
