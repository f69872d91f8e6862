package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based RETENTION/OVERLAP analytics — the set-operation member
  * of the sketch family (`functions/ThetaSketch.scala`), answering the
  * question the exact churn models (q15/q18) pay a fact-sized pass PER
  * PERIOD PAIR for: how many wallets active in period A were also
  * active in period B?
  *
  * Exact period-overlap is a distinct-set self-join — quadratic in the
  * number of periods compared. HLL unions but cannot intersect; theta
  * sketches close BOTH operations with published error, so the 100 TB
  * shape is the family's standard two layers:
  *
  *  1. [[dailyWalletThetaSketches]] — one linear pass per day builds a
  *     per-date_key theta sketch of active wallets (≤32 KB at lgK=12).
  *     Incremental: one row per day, exact watermark appends.
  *  2. [[weekOverWeekRetention]] — weekly unions of the daily rows,
  *     then EACH consecutive-week pair intersects two kilobyte sketches
  *     — an N-week retention series costs N set operations over sketch
  *     rows, never N fact scans.
  *
  * Accuracy (`ThetaSketchSpec` pins both layers against exact): unions
  * keep the configured ~1.6% RSE; intersection error tracks the
  * smaller operand (the library's published bound). Deliberately NOT
  * in `SparkEntry.queries` (DuckDB has no theta sketch) — the opt-in
  * scale path beside the exact churn operators, same layering as the
  * HLL/KLL/frequent-items tiers.
  */
object RetentionModels {

  /** Per-date_key theta sketch of active wallets + exact row count.
    * One shuffle on date_key; sketches partial-aggregate map-side. */
  def dailyWalletThetaSketches(factIn: DataFrame): DataFrame = {
    import factIn.sparkSession.implicits._
    factIn
      .select($"date_key", $"wallet_id")
      .groupBy($"date_key")
      .agg(
        call_function("theta_sketch_agg", $"wallet_id").as("sk_wallets"),
        count($"wallet_id").as("txn_count"))
  }

  /** Week-over-week wallet retention from the materialized daily
    * sketch table: union each week's days, intersect consecutive
    * weeks. Output per week W (except the first): distinct-active
    * estimates for W-1, W, their overlap, and the retention rate
    * |A(W-1) ∩ A(W)| / |A(W-1)|. The weekly frame is weeks-sized —
    * the self-join broadcasts. */
  def weekOverWeekRetention(daily: DataFrame): DataFrame = {
    import daily.sparkSession.implicits._
    val weekly = daily
      .groupBy(date_trunc("week", $"date_key").cast("date").as("week_start"))
      .agg(call_function("theta_union_agg", $"sk_wallets").as("sk_week"))
    val prev = weekly.select(
      (col("week_start") + expr("INTERVAL 7 DAYS")).as("week_start"),
      col("sk_week").as("sk_prev"))
    weekly
      .join(broadcast(prev), Seq("week_start"))
      .select(
        // the runner's materialization contract keys every model on
        // date_key — for this weekly-grain model that is the week start
        $"week_start".as("date_key"),
        round(call_function("theta_estimate", $"sk_prev"))
          .cast("long").as("prev_active_est"),
        round(call_function("theta_estimate", $"sk_week"))
          .cast("long").as("active_est"),
        round(call_function("theta_estimate",
          call_function("theta_intersect", $"sk_prev", $"sk_week")))
          .cast("long").as("retained_est"))
      .withColumn("retention_rate",
        when($"prev_active_est" > 0,
          $"retained_est".cast("double") / $"prev_active_est")
          .otherwise(lit(0.0)))
  }

  /** The two layers composed (dev/test convenience). */
  def retentionSeries(factIn: DataFrame): DataFrame =
    weekOverWeekRetention(dailyWalletThetaSketches(factIn))
}
