package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.models.TxnModels

/** The streaming twin of a REGISTERED incremental model — SURVEY §2.9's
  * optional extension made part of the product: `daily_txn_summary`
  * (the registry's metabase summary, `runner/ModelRegistry.scala`)
  * re-expressed as readStream → event-time window → append sink, with
  * the batch model's aggregate algebra imported VERBATIM
  * (`TxnModels.summaryAggs`/`summaryFinish`) so the two tables cannot
  * drift.
  *
  * Protocol mapping (the streaming-native form of the runner's
  * semantics):
  *  - new event files per micro-batch ≡ the append-only raw table;
  *  - the checkpoint's watermark ≡ the runner's high-watermark cursor
  *    (a restarted catch-up resumes past what it already served);
  *  - append mode emits a day only once the event-time watermark passes
  *    its end ≡ the closed-period gate (days emit exactly once, so the
  *    sink is append-only like the runner's incremental insert);
  *  - `dropDuplicatesWithinWatermark` ≡ the fact's event_id dedupe,
  *    with state bounded by the horizon (duplicates arriving further
  *    apart than the watermark delay are the repair path's job, batch
  *    and stream alike).
  *
  * Scale: state is (open windows × types) aggregate buffers plus the
  * dedupe horizon's event ids; the per-batch shuffle is the same
  * windowed hash agg the batch model plans.
  */
object StreamingModelRunner {

  /** The streaming `daily_txn_summary` plan (unstarted). Watermark is
    * assigned BEFORE the status filter, so control rows (the pipeline's
    * heartbeat/sentinel events, typed 'error') advance event time
    * without ever reaching the aggregate.
    */
  def dailyTxnSummaryStream(spark: SparkSession,
      inputDir: String): DataFrame = {
    val fact = spark.readStream
      .schema(StreamingSummary.eventSchema)
      .option("maxFilesPerTrigger", "1") // deterministic batch-per-file
      .parquet(inputDir)
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("event_id")
      .filter(col("event_type") =!= "error")
      .select(col("ts"), col("event_type").as("txn_type"),
        col("value").cast(TxnModels.Amount).as("amount"))
    TxnModels.summaryFinish(
      fact
        .groupBy(window(col("ts"), "1 day").as("dw"), col("txn_type"))
        .agg(TxnModels.summaryAggs.head, TxnModels.summaryAggs.tail: _*)
        .withColumn("date_key", col("dw.start").cast(DateType))
        .drop("dw"))
  }

  /** One catch-up run (Trigger.AvailableNow): process every file now in
    * `inputDir`, append the newly closed days to `targetDir`, stop. Two
    * consecutive catch-ups with the same checkpoint behave exactly like
    * two daily batch runs: the second appends only days that closed
    * since the first — the runner's incremental protocol, driven by the
    * checkpointed watermark instead of a table probe.
    */
  def catchUp(spark: SparkSession, inputDir: String, checkpointDir: String,
      targetDir: String): StreamingQuery =
    dailyTxnSummaryStream(spark, inputDir).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
