package graft.runner

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.models._

/** The production model DAG: the KRE economics chain wired into the
  * incremental runner — the engine's equivalent of the reference's
  * `load_scripts/` tree executed by `execute_snowflake_load.py`
  * (SURVEY.md §0, §3.1), with dependencies DECLARED instead of implied
  * by path sort order.
  *
  *   events ─→ fact_txn ────────────┬→ active_user_balance ─┐
  *   events ─→ closing_balance ─────┘                       ├→ daily_payout ─→ weekly_payout
  *            fact_txn ─→ volatility_factor ────────────────┘
  *
  * Each model's builder reads ONLY through the resolver (raw sources or
  * other models' materialized targets), so the runner's watermark /
  * closed-period / repair semantics apply uniformly. Lookback models
  * (VF, AUB) read their FULL upstream and the runner slices only the
  * output rows above the watermark — late-window recomputation is exact.
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
      }))
}
