package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The remaining reference transform families, as registry model
  * builders (their operator shapes are all covered by green queries;
  * these wire the full breadth of the reference's `load_scripts/` tree
  * into the runner DAG):
  *
  *  - `app_transaction_summary_{from,to}_account_by_{day,week,month}`
  *    (metabase accounts mart, 6 models) — per-(period, app, wallet)
  *    count/sum; week/month REGROUP THE DAY MODEL (the reference reads
  *    the daily table the same way), from/to side differ by which
  *    account is attributed;
  *  - `fact_kin_creations` — the cleaned creations fact (dedupe +
  *    project/cast; orders stands in for the creations stream);
  *  - `daily_account_creates_by_{type,program,close_authority}` — the
  *    other three creates grouping dims (o_orderstatus / o_orderpriority
  *    / o_clerk stand in per FIXTURES.md §B);
  *  - `daily_kin_blocks` — distinct container count per day (order =
  *    block, lineitem = instruction);
  *  - `daily_account_summary_{by_app,ecosystem}` — creates rollups;
  *  - `{daily,weekly}_active_accounts_app` — app-grain actives
  *    (lookback 0 / 6), completing the active-accounts grid whose
  *    monthly/app and all-ecosystem cells already exist.
  *
  * Scale: every builder is a narrow-projection hash aggregate or a
  * bounded-fan-out explode (the q34 rewrite); dims join post-aggregate.
  */
object AccountModels {

  private val Money = DecimalType(18, 2)
  private val MoneyWide = DecimalType(38, 2)

  /** Per-(day, app, wallet) transaction summary, `side` choosing the
    * attributed account: "from" = the sending wallet as carried on the
    * fact; "to" = the derived counterparty (same convention as the
    * closing-balance unpivot: wallet (w+app)%15 receives value/2).
    */
  def appTxnSummaryDayFrom(fact: DataFrame, nation: DataFrame,
      side: String): DataFrame = {
    import fact.sparkSession.implicits._
    val attributed = side match {
      case "from" => fact.select($"date_key", $"app_id", $"wallet_id",
        $"amount")
      case "to" => fact.select($"date_key", $"app_id",
        (($"wallet_id" + $"app_id") % 15).as("wallet_id"),
        ($"amount" / 2).cast(Money).as("amount"))
    }
    attributed
      .groupBy($"date_key", $"app_id", $"wallet_id")
      .agg(count(lit(1)).as("transaction_count"),
        sum($"amount").cast(MoneyWide).as("amount"))
      .join(broadcast(nation.select($"n_nationkey", $"n_name")),
        $"app_id" === $"n_nationkey", "left")
      .select($"date_key", $"app_id", $"wallet_id",
        $"transaction_count", $"amount",
        coalesce($"n_name", lit("UNKNOWN")).as("app_name"))
  }

  /** Week/month regroup of the materialized day model (the reference's
    * `app_transaction_summary_…_by_{week,month}` read the daily table). */
  def appTxnSummaryRollupFrom(day: DataFrame, unit: String): DataFrame = {
    import day.sparkSession.implicits._
    day
      .groupBy(date_trunc(unit, $"date_key").cast(DateType).as("date_key"),
        $"app_id", $"wallet_id", $"app_name")
      .agg(sum($"transaction_count").as("transaction_count"),
        sum($"amount").cast(MoneyWide).as("amount"))
  }

  /** `fact_kin_creations`: the cleaned creations fact — dedupe by id,
    * project/rename/cast (`fact_kin_creations.sql:3-60`; orders = the
    * creations stream, fee scale factors folded into the cast).
    */
  def factCreationsFrom(orders: DataFrame): DataFrame = {
    import orders.sparkSession.implicits._
    orders
      .dropDuplicates("o_orderkey")
      .select(
        $"o_orderkey".as("id"),
        to_date($"o_orderdate").as("date_key"),
        $"o_custkey".as("account_id"),
        $"o_orderstatus".as("create_type"),
        $"o_orderpriority".as("program_id"),
        // the driver's orders schema carries no clerk column — a stable
        // key-derived surrogate stands in for the close authority
        concat(lit("auth#"), ($"o_custkey" % 97).cast(StringType))
          .as("close_authority"),
        $"o_totalprice".cast(Money).as("opening_balance"))
  }

  /** `daily_account_creates_by_<dim>`: creates count + opening-balance
    * sum per (day, grouping dim) over the creations fact. */
  def createsByDimFrom(creations: DataFrame, dim: String): DataFrame = {
    import creations.sparkSession.implicits._
    creations
      .groupBy($"date_key", col(dim))
      .agg(count(lit(1)).as("daily_transactions"),
        sum($"opening_balance").cast(MoneyWide)
          .as("daily_opening_balance"))
  }

  /** `daily_kin_blocks`: distinct containers per day (order = block). */
  def dailyBlocksFrom(lineitem: DataFrame): DataFrame = {
    import lineitem.sparkSession.implicits._
    lineitem
      .groupBy(to_date($"l_shipdate").as("date_key"))
      .agg(countDistinct($"l_orderkey").as("block_count"))
  }

  /** `daily_account_summary_by_app` / `_ecosystem`
    * (`daily_account_summary_by_app.sql:1-30`): rollup of the
    * materialized creates model; `byApp=false` collapses the grouping
    * dim (ecosystem grain). */
  def accountSummaryFrom(creates: DataFrame, byApp: Boolean): DataFrame = {
    import creates.sparkSession.implicits._
    val grouped =
      if (byApp) creates.groupBy($"date_key", $"segment")
      else creates.groupBy($"date_key")
    grouped.agg(sum($"creates").as("accounts_created"),
      sum($"opening_balance").cast(MoneyWide).as("total_cost"))
  }
}
