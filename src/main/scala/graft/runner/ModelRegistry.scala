package graft.runner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.models._

/** The production model DAG: the full mart set wired into the
  * incremental runner — the engine's equivalent of the reference's
  * `load_scripts/` tree executed by `execute_snowflake_load.py`
  * (SURVEY.md §0, §3.1; mart order at `execute_snowflake_load.py:34`),
  * with dependencies DECLARED instead of implied by path sort order.
  *
  * Warehouse layer (raw → facts):
  *   events ─→ fact_txn, closing_balance
  * KRE mart:
  *   fact_txn ─→ volatility_factor;  fact_txn+closing_balance ─→
  *   active_user_balance ─→ daily_payout ─→ weekly_payout
  * Metabase mart (reporting):
  *   fact_txn ─→ daily_txn_summary, amount_histogram,
  *   daily_active_union, monthly_active_accounts;
  *   closing_balance ─→ balance_buckets, daily_churn_volume;
  *   daily_payout+closing_balance+daily_churn_volume ─→
  *   daily_net_inflation
  * API mart:
  *   fact_txn+active_user_balance+volatility_factor+daily_payout ─→
  *   daily_kre_summary
  *
  * Each model's builder reads ONLY through the resolver (raw sources or
  * other models' materialized targets), so the runner's watermark /
  * closed-period / repair semantics apply uniformly. Lookback models
  * (VF, AUB, monthly actives) read their FULL upstream and the runner
  * slices only the output rows above the watermark — late-window
  * recomputation is exact; forward-window models (churn, net inflation)
  * gate themselves to complete windows so emitted rows never change.
  */
object ModelRegistry {

  /** nation-as-app-dim resolver key used by daily_payout. */
  val AppDim = "nation"

  val kreDag: Seq[ModelDef] = Seq(
    ModelDef("fact_txn", Cadence.Daily, Seq("events"),
      (_, resolve) => TxnModels.factTxnFrom(resolve("events"))),
    ModelDef("closing_balance", Cadence.Daily, Seq("events"),
      (_, resolve) => ActivityModels.closingBalanceFrom(resolve("events"))),
    ModelDef("volatility_factor", Cadence.Daily, Seq("fact_txn"),
      (_, resolve) => KreModels.volatilityFactorFrom(resolve("fact_txn"))),
    ModelDef("active_user_balance", Cadence.Daily,
      Seq("fact_txn", "closing_balance"),
      (_, resolve) => KreModels.activeUserBalanceFrom(
        resolve("fact_txn"), resolve("closing_balance"))),
    ModelDef("daily_payout", Cadence.Daily,
      Seq("active_user_balance", "volatility_factor", AppDim),
      (s, resolve) => {
        import s.implicits._
        KreModels.dailyPayoutFrom(s,
          resolve("active_user_balance")
            .select($"date_key", $"app_id", $"capped_aub"),
          resolve("volatility_factor"),
          resolve(AppDim))
      }),
    ModelDef("weekly_payout", Cadence.Weekly, Seq("daily_payout"),
      (s, resolve) => {
        import s.implicits._
        import org.apache.spark.sql.types._
        val payout = resolve("daily_payout")
          .select($"date_key", $"app_id", $"app_name",
            $"post_monopoly_payout", $"post_monopoly_payout_usd")
        val weeks = payout
          .select(date_trunc("week", $"date_key").cast(DateType)
            .as("week_key")).distinct()
        payout
          .join(broadcast(weeks),
            $"date_key" >= date_sub($"week_key", 8) &&
              $"date_key" <= date_sub($"week_key", 2))
          .groupBy($"week_key", $"app_id", $"app_name")
          .agg(
            sum($"post_monopoly_payout").cast(DecimalType(38, 2))
              .as("weekly_kin_payout"),
            sum($"post_monopoly_payout_usd").cast(DecimalType(38, 2))
              .as("weekly_usd_payout"))
          // the runner's watermark column is date_key by convention
          .withColumnRenamed("week_key", "date_key")
      }),
    // --- metabase mart (reporting) ---
    ModelDef("daily_txn_summary", Cadence.Daily, Seq("fact_txn"),
      (_, resolve) => TxnModels.dailyTxnSummaryFrom(resolve("fact_txn"))),
    ModelDef("daily_distinct_wallets", Cadence.Daily, Seq("fact_txn"),
      (_, resolve) =>
        ActivityModels.dailyDistinctWalletsFrom(resolve("fact_txn"))),
    // weekly/monthly re-aggregations of the fact — the reference's
    // weekly/monthly_kin_transactions; period_key renamed to the
    // runner's date_key watermark convention (like weekly_payout)
    ModelDef("weekly_txn_rollup", Cadence.Weekly, Seq("fact_txn"),
      (_, resolve) =>
        PayoutModels.periodTxnRollupFrom("week", resolve("fact_txn"))
          .withColumnRenamed("period_key", "date_key")),
    ModelDef("monthly_txn_rollup", Cadence.Monthly, Seq("fact_txn"),
      (_, resolve) =>
        PayoutModels.periodTxnRollupFrom("month", resolve("fact_txn"))
          .withColumnRenamed("period_key", "date_key")),
    ModelDef("amount_histogram", Cadence.Daily, Seq("fact_txn"),
      (_, resolve) => ActivityModels.amountHistogramFrom(resolve("fact_txn"))),
    ModelDef("daily_active_union", Cadence.Daily, Seq("fact_txn"),
      (_, resolve) => ActivityModels.dailyActiveUnionFrom(resolve("fact_txn"))),
    ModelDef("monthly_active_accounts", Cadence.Daily, Seq("fact_txn"),
      (_, resolve) =>
        CompositeModels.monthlyActiveAccountsFrom(resolve("fact_txn"))),
    ModelDef("balance_buckets", Cadence.Daily, Seq("closing_balance"),
      (_, resolve) =>
        ActivityModels.balanceBucketsFrom(resolve("closing_balance"))),
    ModelDef("daily_churn_volume", Cadence.Daily, Seq("closing_balance"),
      (_, resolve) =>
        CompositeModels.dailyChurnVolumeFrom(resolve("closing_balance"))),
    ModelDef("daily_net_inflation", Cadence.Daily,
      Seq("daily_payout", "closing_balance", "daily_churn_volume"),
      (_, resolve) => CompositeModels.dailyNetInflationFrom(
        resolve("daily_payout"), resolve("closing_balance"),
        resolve("daily_churn_volume"))),
    // --- api mart ---
    ModelDef("daily_kre_summary", Cadence.Daily,
      Seq("fact_txn", "active_user_balance", "volatility_factor",
        "daily_payout"),
      (_, resolve) => CompositeModels.dailyKreSummaryFrom(
        resolve("fact_txn"), resolve("active_user_balance"),
        resolve("volatility_factor"), resolve("daily_payout"))))
}
