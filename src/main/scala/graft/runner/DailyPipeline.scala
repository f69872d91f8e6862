package graft.runner

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.seed.ExternalSeed
import graft.sinks.Replicator

/** The composed daily run — the engine's analog of the reference's
  * pipeline manifest (`sf_daily_pipeline.yaml:5-17`), which sequences
  * three tasks per day:
  *
  *   1. Daily Seed        (`external_endpoint_data_seed.py`)
  *   2. Daily Models      (`execute_snowflake_load.py`)
  *   3. Daily replication (`snowflake_postgres_replicator.py`)
  *
  * One `run()` performs seed → full model DAG (incl. clone publication)
  * → serving-store replication, each stage delegating to the component
  * that owns its semantics (`ExternalSeed`, `IncrementalRunner`,
  * `Replicator`). Idempotent by construction: every stage is
  * watermark- or overwrite-based, so a re-run with no new data writes
  * nothing new.
  */
object DailyPipeline {

  /** One API-facing replication: serving table ← source model, with the
    * reference's explicit column renames where they go beyond
    * camelization, and the sink-side watermark column they imply. */
  final case class ServingSpec(
      table: String, model: String,
      renames: Map[String, String] = Map.empty,
      watermarkCol: String = "dateKey")

  /** The reference's seven API-facing replications: the six daily SQL
    * files under `load_scripts/postgres_replication/daily_models/` plus
    * the weekly `weekly_models/krePayoutSummary.sql`. The camelCase
    * rename projection (+ per-table overrides) is applied by the
    * Replicator.
    */
  val ServingTables: Seq[ServingSpec] = Seq(
    // dailySummaryApp.sql:1-29 — serves the wide per-app API row with
    // the reference's full rename list (`app_id as "index"`, …)
    ServingSpec("dailySummaryApp", "daily_summary_by_app",
      renames = Map(
        "date_key" -> "date",
        "app_id" -> "index",
        "app_name" -> "name",
        "transaction_count" -> "totalDailyTransactions",
        "transaction_amount_kin" -> "totalDailyAmount",
        "transaction_amount_usd" -> "totalDailyAmountUsd",
        "earn_count" -> "dailyEarnTransactions",
        "earn_amount_kin" -> "dailyEarnAmount",
        "earn_amount_usd" -> "dailyEarnAmountUsd",
        "spend_count" -> "dailySpendTransactions",
        "spend_amount_kin" -> "dailySpendAmount",
        "spend_amount_usd" -> "dailySpendAmountUsd",
        "peer_count" -> "dailyPeerTransactions",
        "peer_amount_kin" -> "dailyPeerAmount",
        "peer_amount_usd" -> "dailyPeerAmountUsd"),
      watermarkCol = "date"),
    // dailyAccountSummaryApp.sql — the creates summary ("segment" is the
    // fixture's app key for the creates family; total_cost is the single
    // cost column — the fixture has no solana-price series to split it)
    ServingSpec("dailyAccountSummaryApp", "daily_account_summary_by_app",
      renames = Map(
        "date_key" -> "date",
        "segment" -> "index",
        "accounts_created" -> "accountsCreated",
        "total_cost" -> "solCost"),
      watermarkCol = "date"),
    ServingSpec("dailyAccountSummaryEcosystem",
      "daily_account_summary_ecosystem",
      renames = Map(
        "date_key" -> "date",
        "accounts_created" -> "accountsCreated",
        "total_cost" -> "solCost"),
      watermarkCol = "date"),
    // dailyMarketSummary.sql (no circulating-supply analog in fixture)
    ServingSpec("dailyMarketSummary", "market_summary",
      renames = Map(
        "date_key" -> "date",
        "avg_price" -> "price",
        "market_cap" -> "marketCap",
        "volume" -> "tradeVolume"),
      watermarkCol = "date"),
    // dailySummaryEcosystem.sql (the ecosystem twin of dailySummaryApp;
    // our q39 row carries no fee columns — the per-app row q40 does)
    ServingSpec("dailySummaryEcosystem", "daily_summary_ecosystem",
      renames = Map(
        "date_key" -> "date",
        "app_count" -> "monthlyActiveApps",
        "transaction_count" -> "totalDailyTransactions",
        "transaction_amount_kin" -> "totalDailyAmount",
        "transaction_amount_usd" -> "totalDailyAmountUsd",
        "earn_count" -> "dailyEarnTransactions",
        "earn_amount_kin" -> "dailyEarnAmount",
        "earn_amount_usd" -> "dailyEarnAmountUsd",
        "spend_count" -> "dailySpendTransactions",
        "spend_amount_kin" -> "dailySpendAmount",
        "spend_amount_usd" -> "dailySpendAmountUsd",
        "peer_count" -> "dailyPeerTransactions",
        "peer_amount_kin" -> "dailyPeerAmount",
        "peer_amount_usd" -> "dailyPeerAmountUsd"),
      watermarkCol = "date"),
    // kreSummary.sql
    ServingSpec("kreSummary", "daily_kre_summary",
      renames = Map(
        "date_key" -> "date",
        "volatility_factor" -> "dailyVolatilityFactor",
        "kin_payout" -> "dailyKinPayout",
        "usd_payout" -> "dailyUsdPayout",
        "transaction_count" -> "dailyTransactions"),
      watermarkCol = "date"),
    // krePayoutSummary.sql:1-9 — the weekly payout API row
    ServingSpec("krePayoutSummary", "weekly_kre_payout_summary",
      renames = Map(
        "date_key" -> "date",
        "kin_payout" -> "kin",
        "usd_payout" -> "usd",
        "top_app_list" -> "top10"),
      watermarkCol = "date"))

  final case class Report(
      modelRows: Map[String, Long],
      servedRows: Map[String, Long])
}

final class DailyPipeline(
    spark: SparkSession,
    warehouseDir: String,
    servingDir: String,
    today: LocalDate,
    // optional serving backend override: pass a JdbcServingStore to
    // replicate into a real database instead of the parquet directory
    servingStore: Option[graft.sinks.ServingStore] = None) {

  val runner = new IncrementalRunner(spark, warehouseDir, today)
  val replicator = servingStore match {
    case Some(store) => new Replicator(spark, store)
    case None => new Replicator(spark, servingDir)
  }

  /** One daily run. `sources` resolves raw tables; the seed inputs are
    * optional pre-fetched payloads (the network fetch stays outside the
    * engine — SURVEY §2.1 S5/S6): `appDirectoryJson` is the app-directory
    * payload, `priceSeries` the (prices, market_caps, total_volumes)
    * series triple.
    */
  def run(
      sources: String => DataFrame,
      appDirectoryJson: Option[String] = None,
      priceSeries: Option[(DataFrame, DataFrame, DataFrame)] = None)
      : DailyPipeline.Report = {
    // --- 1. Daily Seed: external payloads → warehouse dims (overwrite:
    // the reference re-CTASes both dims on every seed run)
    appDirectoryJson.foreach { json =>
      ExternalSeed.seedDimAppFromJson(spark, json)
        .write.mode(SaveMode.Overwrite).parquet(runner.targetPath("dim_app"))
    }
    priceSeries.foreach { case (p, m, v) =>
      ExternalSeed.buildPriceDim(spark, p, m, v)
        .write.mode(SaveMode.Overwrite)
        .parquet(runner.targetPath("dim_price"))
    }
    // dims resolve like models (materialized targets) for any consumer,
    // ahead of raw sources
    val resolve: String => DataFrame = {
      case d @ ("dim_app" | "dim_price") if runner.exists(d) =>
        runner.readModel(d)
      case other => sources(other)
    }
    // --- 2. Daily Models: the full DAG + clone publications
    val modelRows =
      runner.runAll(ModelRegistry.kreDag, resolve, ModelRegistry.clones)
    // --- 3. Daily replication: API-facing camelCase serving copies
    val servedRows = DailyPipeline.ServingTables.map { spec =>
      spec.table -> replicator.replicate(spec.table,
        runner.readModel(spec.model),
        renames = spec.renames, watermarkCol = spec.watermarkCol)
    }.toMap
    // --- 4. SQL-name catalog: every materialized model (and seeded dim)
    // addressable by name via spark.sql — re-registered each run so the
    // views see the partitions this run appended
    runner.registerViews(ModelRegistry.kreDag, Seq("dim_app", "dim_price"))
    DailyPipeline.Report(modelRows, servedRows)
  }
}
