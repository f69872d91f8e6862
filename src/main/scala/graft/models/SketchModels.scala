package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based SCALE VARIANT of the rolling active-accounts family —
  * the production 100 TB architecture for MAU/WAU-style rolling
  * distinct counts, built on Spark 4's DataSketches HLL builtins
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  *
  * The exact path (`CompositeModels.activeAccountsAppFrom`) explodes
  * the deduped (date, app, wallet) grid ×(lookback+1) — correct, and
  * required for oracle parity, but the shuffled volume grows with
  * DISTINCT WALLETS × window width. At 100 TB the standard fix is a
  * two-layer sketch pipeline:
  *
  *  1. [[dailyActiveSketches]] — one linear pass over the fact builds a
  *     per-(date, app) HLL sketch per role. This is the incremental
  *     model the runner materializes: each day appends |apps| rows of
  *     ~KB-sized binary sketches, and never needs to be re-read at raw
  *     grain.
  *  2. [[rollingFromSketches]] — the rolling window unions
  *     (lookback+1) SKETCH ROWS per (anchor, app) and estimates. The
  *     explode fan-out is over the sketch table (|days|×|apps| rows),
  *     not the wallet grid — a daily 30-day MAU refresh reads 30×|apps|
  *     kilobyte rows instead of re-scanning 30 days of events.
  *
  * Sketches are MERGEABLE, so partial aggregation applies at every
  * layer and backfills parallelize per day. Estimates are approximate
  * (default lgConfigK=12 → ~1.6% rsd); `SketchSpec` pins the observed
  * error against the exact path at sf0.01. Not oracle-checked (DuckDB
  * has no compatible HLL), deliberately NOT in `SparkEntry.queries` —
  * this is the documented opt-in scale path, the exact operator remains
  * the correctness surface (same relationship as s01 ↔ s02/s03).
  */
object SketchModels {

  /** Per-(date_key, app_id) HLL sketches for the three activity roles.
    * One shuffle on (date, app) — sketches partial-aggregate map-side.
    */
  def dailyActiveSketches(factIn: DataFrame): DataFrame = {
    import factIn.sparkSession.implicits._
    factIn
      .select($"date_key", $"app_id", $"wallet_id", $"txn_type")
      .filter($"txn_type".isin("purchase", "click", "signup", "view"))
      .groupBy($"date_key", $"app_id")
      .agg(
        expr("hll_sketch_agg(wallet_id)").as("sk_users"),
        expr("hll_sketch_agg(CASE WHEN txn_type IN ('purchase','click')" +
          " THEN wallet_id END)").as("sk_spenders"),
        expr("hll_sketch_agg(CASE WHEN txn_type IN ('signup','view')" +
          " THEN wallet_id END)").as("sk_earners"))
  }

  /** Rolling (lookback+1)-day estimates from the materialized sketch
    * table: explode each day's sketch row to the anchors it serves
    * (the q16/q34 rewrite, but over kilobyte rows), union per
    * (anchor, app), estimate. */
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
        // a window with no rows for a role yields a NULL union (agg
        // skips null sketches) — estimate 0, matching the exact path
        coalesce(expr("hll_sketch_estimate(hll_union_agg(sk_users))"),
          lit(0L)).as("active_users_est"),
        coalesce(expr("hll_sketch_estimate(hll_union_agg(sk_spenders))"),
          lit(0L)).as("active_spenders_est"),
        coalesce(expr("hll_sketch_estimate(hll_union_agg(sk_earners))"),
          lit(0L)).as("active_earners_est"))
      .withColumnRenamed("anchor_date", "date_key")
  }

  /** The two layers composed (dev/test convenience; in production the
    * runner materializes layer 1 and layer 2 reads the target). */
  def activeAccountsAppSketch(factIn: DataFrame, lookback: Int): DataFrame =
    rollingFromSketches(dailyActiveSketches(factIn), lookback)
}
