package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STREAM-STREAM JOIN — the last of the Structured Streaming join/state
  * primitives (alongside the windowed agg, dropDuplicates state, and
  * flatMapGroupsWithState tiers): live events enriched with the most
  * recent PRICE TICK at or before each event, both sides unbounded.
  *
  * This is the streaming twin of the batch as-of join (q43): where the
  * batch operator carries prices forward over a materialized calendar,
  * a stream can't see the future, so the join takes every tick within
  * a bounded lookback (`TickLookback`) of the event — the watermarked
  * interval condition Spark needs to PRUNE state — and the aggregate
  * keeps the latest (`max_by`), which is exactly the as-of semantics
  * restricted to the lookback horizon.
  *
  * Scale contract: Spark refuses a stream-stream join without an
  * EQUALITY predicate (state would be all-pairs), so the join keys on a
  * coarse calendar-day bucket — each tick is exploded to the two
  * buckets it can govern (its day and the next, since the lookback is
  * one day), each event keys on its own day, and the interval condition
  * refines inside the bucket. A (event, tick) pair inside the interval
  * shares exactly ONE bucket, so multiplicity is untouched. With both
  * watermarks set, each side buffers only rows the other could still
  * match — state is O(horizon), hash-partitioned by bucket, never
  * unbounded or all-pairs.
  */
object StreamingEnrichment {

  /** How far back an event looks for its governing tick. */
  val TickLookback = "1 day"

  val tickSchema: StructType = StructType(Seq(
    StructField("tick_ts", TimestampType),
    StructField("price", DoubleType)))

  /** events ⋈ ticks within [event − lookback, event], then latest tick
    * per event (as-of-within-horizon). Both inputs are file-source
    * streams; the caller owns trigger/sink. */
  def enrichedEvents(spark: SparkSession, eventsDir: String,
      ticksDir: String): DataFrame = {
    import spark.implicits._
    val events = spark.readStream
      .schema(StreamingSummary.eventSchema)
      .option("maxFilesPerTrigger", "1") // deterministic batch-per-file
      .parquet(eventsDir)
      .filter($"event_type" =!= "error")
      .select($"event_id", $"ts", $"user_id", $"value")
      .withWatermark("ts", "1 minute")
    val ticks = spark.readStream
      .schema(tickSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(ticksDir)
      .withWatermark("tick_ts", "1 minute")
    // the bucket equi key (see scaladoc): tick governs its own day and
    // the next; the event looks up its own day only
    val eventsB = events.withColumn("bucket", to_date($"ts"))
    val ticksB = ticks.withColumn("bucket",
      explode(array(to_date($"tick_ts"),
        date_add(to_date($"tick_ts"), 1))))
    eventsB
      .join(ticksB,
        eventsB("bucket") === ticksB("bucket") &&
          $"tick_ts" <= $"ts" &&
          $"tick_ts" >= $"ts" - expr(s"INTERVAL $TickLookback"))
      // latest tick at-or-before the event = the as-of price; grouping
      // by the event key keeps this a streaming-supported aggregate
      .groupBy($"event_id", $"ts", $"user_id", $"value")
      .agg(max_by($"price", $"tick_ts").as("asof_price"),
        max($"tick_ts").as("asof_tick_ts"))
  }
}
