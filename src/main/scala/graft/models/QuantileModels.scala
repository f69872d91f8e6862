package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based SCALE VARIANT of rolling amount percentiles — the
  * mergeable-quantiles sibling of [[SketchModels]]' HLL tier, built on
  * the native KLL aggregates (`functions/KllQuantile.scala`).
  *
  * The exact path (q02's `percentile(0.5)`) buffers every value per
  * group — fine per day, but a ROLLING percentile (p50/p90/p99 of txn
  * amount over the trailing 30 days, per app) would re-shuffle
  * 30× the raw fact values per anchor. At 100 TB the standard fix is
  * the same two-layer shape as the HLL tier:
  *
  *  1. [[dailyAmountSketches]] — one linear pass over the fact builds a
  *     per-(date, app) KLL sketch of amounts. Incremental: each day
  *     appends |apps| rows of ≤3 KB binary sketches (within-day
  *     aggregates keyed by date_key → exact watermark appends).
  *  2. [[rollingFromSketches]] — the rolling window merges (lookback+1)
  *     SKETCH ROWS per (anchor, app) and reads p50/p90/p99 off the
  *     merged sketch: a daily 30-day refresh reads 30×|apps| kilobyte
  *     rows instead of re-scanning 30 days of raw events.
  *
  * KLL sketches are MERGEABLE (partial aggregation applies at every
  * layer; backfills parallelize per day) with a published normalized
  * RANK error bound (~1.65% at k=200, 99% confidence) and randomized
  * compaction — `QuantileSketchSpec` pins the observed rank error
  * against the exact sort at sf0.01 and the merge-equals-rebuild
  * property the incremental materialization depends on. Not
  * oracle-checked (DuckDB has no compatible KLL), deliberately NOT in
  * `SparkEntry.queries` — the documented opt-in scale path beside the
  * exact operators, same layering as the HLL tier and s01 ↔ s02/s03.
  */
object QuantileModels {

  /** Per-(date_key, app_id) KLL sketch of txn amounts + exact row count.
    * One shuffle on (date, app) — sketches partial-aggregate map-side
    * (object hash aggregate, serialized only at the shuffle boundary).
    */
  def dailyAmountSketches(factIn: DataFrame): DataFrame = {
    import factIn.sparkSession.implicits._
    factIn
      .select($"date_key", $"app_id", $"amount".cast("double").as("amount_d"))
      .groupBy($"date_key", $"app_id")
      .agg(
        call_function("kll_sketch_agg", $"amount_d").as("sk_amount"),
        count($"amount_d").as("txn_count"))
  }

  /** Rolling (lookback+1)-day amount percentiles from the materialized
    * sketch table: explode each day's sketch row to the anchors it
    * serves (the q16/q34 rewrite, but over kilobyte rows), merge per
    * (anchor, app), read the quantiles. */
  def rollingFromSketches(daily: DataFrame, lookback: Int): DataFrame = {
    import daily.sparkSession.implicits._
    val days = daily.select($"date_key").distinct()
      .withColumnRenamed("date_key", "anchor_date")
    daily
      .withColumn("anchor_date",
        explode(sequence($"date_key", date_add($"date_key", lookback))))
      .join(broadcast(days), Seq("anchor_date"), "left_semi")
      .groupBy($"anchor_date", $"app_id")
      .agg(
        call_function("kll_merge_agg", $"sk_amount").as("sk"),
        sum($"txn_count").as("txn_count"))
      .select(
        $"anchor_date".as("date_key"), $"app_id",
        call_function("kll_value_at", $"sk", lit(0.5d)).as("p50_amount_est"),
        call_function("kll_value_at", $"sk", lit(0.9d)).as("p90_amount_est"),
        call_function("kll_value_at", $"sk", lit(0.99d)).as("p99_amount_est"),
        $"txn_count")
  }

  /** The two layers composed (dev/test convenience; in production the
    * runner materializes layer 1 and layer 2 reads the target). */
  def rollingAmountQuantiles(factIn: DataFrame, lookback: Int): DataFrame =
    rollingFromSketches(dailyAmountSketches(factIn), lookback)
}
