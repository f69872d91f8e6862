package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.models._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a named entry in
  * `queries` and (where SQL-expressible) a DuckDB oracle in `oracleSql`.
  * Column names/types are aligned between the Spark build and the oracle
  * (driver compares sorted-by-name hashed values).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TxnModels.dailyTxnSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_fact_txn" -> (TxnModels.factTxn _),
    "q02_daily_txn_summary" -> (TxnModels.dailyTxnSummary _),
    "q03_daily_distinct_wallets" -> (ActivityModels.dailyDistinctWallets _),
    "q04_amount_histogram" -> (ActivityModels.amountHistogram _),
    "q05_app_summary_dim" -> (PayoutModels.appSummaryDim _),
    "q06_wallet_day_join" -> (PayoutModels.walletDayJoin _),
    "q07_daily_active_union" -> (ActivityModels.dailyActiveUnion _),
    "q08_union_all_balances" -> (TpchModels.unionAllBalances _),
    "q09_weekly_txn_rollup" -> (PayoutModels.periodTxnRollup("week") _),
    "q10_monthly_txn_rollup" -> (PayoutModels.periodTxnRollup("month") _),
    "q11_top_apps_daily" -> (PayoutModels.topAppsDaily _),
    "q12_latest_wallet_state" -> (ActivityModels.latestWalletState _),
    "q13_semi_join_high_balance" -> (TpchModels.semiJoinHighBalance _),
    "q14_anti_join_inactive" -> (TpchModels.antiJoinInactive _),
    "q15_churn_30d" -> (ActivityModels.churn30d _),
    "q16_rolling_7d_active" -> (ActivityModels.rolling7dActive _),
    "q17_rolling_30d_price" -> (TpchModels.rolling30dPrice _),
    "q18_daily_delta" -> (ActivityModels.dailyDelta _),
    "q19_closing_balance" -> (ActivityModels.closingBalance _),
    "q20_daily_wide_summary" -> (TpchModels.dailyWideSummary _),
    "q21_having_frequent_buyers" -> (TpchModels.havingFrequentBuyers _),
    "q22_capped_app_balance" -> (PayoutModels.cappedAppBalance _),
    "q23_weekly_top_apps_json" -> (PayoutModels.weeklyTopAppsJson _),
    "q24_market_summary" -> (TpchModels.marketSummary _),
    "q25_creates_by_segment" -> (TpchModels.createsBySegment _),
    "q26_daily_payout" -> (KreModels.dailyPayout _),
    "q27_volatility_factor" -> (KreModels.volatilityFactor _),
    "q28_active_user_balance" -> (KreModels.activeUserBalance _),
    "q29_kre_weekly_payout" -> (KreModels.kreWeeklyPayout _),
    "q30_gc_impacted_accounts" -> (TpchModels.gcImpactedAccounts _),
    "q31_balance_buckets" -> (ActivityModels.balanceBuckets _),
    "q32_monthly_inactive_wallets" -> (ActivityModels.monthlyInactiveWallets _),
    // --- beyond-reference: dedup / similarity / text (SURVEY.md §7.2 M8) ---
    "d01_dedup_exact" -> (DedupModels.dedupExact _),
    "d02_minhash_signatures" -> (DedupModels.minhashSignatures _),
    "d03_lsh_near_dup_pairs" -> (DedupModels.lshNearDupPairs _),
    "d04_simhash16" -> (DedupModels.simhash16 _),
    "d05_embedding_near_dup" -> (SimilarityModels.embeddingNearDupPairs _),
    "d06_edit_distance_pairs" -> (DedupModels.editDistancePairs _),
    "s01_cosine_topk" -> (SimilarityModels.cosineTopK _),
    "s02_lsh_ann_buckets" -> (SimilarityModels.lshAnnBuckets _),
    "t01_lang_profile" -> (TextModels.langProfile _),
    "t02_lang_id_heuristic" -> (TextModels.langIdHeuristic _),
    "t03_quality_score" -> (TextModels.qualityScore _),
    "t04_token_counts" -> (TextModels.tokenCounts _),
    "t05_fingerprint_dedup" -> (TextModels.fingerprintDedup _),
    "m01_media_meta_summary" -> (graft.multimodal.MultimodalOps.mediaMetaSummary _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_fact_txn" -> TxnModels.factTxnOracle,
    "q02_daily_txn_summary" -> TxnModels.dailyTxnSummaryOracle,
    "q03_daily_distinct_wallets" -> ActivityModels.dailyDistinctWalletsOracle,
    "q04_amount_histogram" -> ActivityModels.amountHistogramOracle,
    "q05_app_summary_dim" -> PayoutModels.appSummaryDimOracle,
    "q06_wallet_day_join" -> PayoutModels.walletDayJoinOracle,
    "q07_daily_active_union" -> ActivityModels.dailyActiveUnionOracle,
    "q08_union_all_balances" -> TpchModels.unionAllBalancesOracle,
    "q09_weekly_txn_rollup" -> PayoutModels.periodTxnRollupOracle("week"),
    "q10_monthly_txn_rollup" -> PayoutModels.periodTxnRollupOracle("month"),
    "q11_top_apps_daily" -> PayoutModels.topAppsDailyOracle,
    "q12_latest_wallet_state" -> ActivityModels.latestWalletStateOracle,
    "q13_semi_join_high_balance" -> TpchModels.semiJoinHighBalanceOracle,
    "q14_anti_join_inactive" -> TpchModels.antiJoinInactiveOracle,
    "q15_churn_30d" -> ActivityModels.churn30dOracle,
    "q16_rolling_7d_active" -> ActivityModels.rolling7dActiveOracle,
    "q17_rolling_30d_price" -> TpchModels.rolling30dPriceOracle,
    "q18_daily_delta" -> ActivityModels.dailyDeltaOracle,
    "q19_closing_balance" -> ActivityModels.closingBalanceOracle,
    "q20_daily_wide_summary" -> TpchModels.dailyWideSummaryOracle,
    "q21_having_frequent_buyers" -> TpchModels.havingFrequentBuyersOracle,
    "q22_capped_app_balance" -> PayoutModels.cappedAppBalanceOracle,
    "q23_weekly_top_apps_json" -> PayoutModels.weeklyTopAppsJsonOracle,
    "q24_market_summary" -> TpchModels.marketSummaryOracle,
    "q25_creates_by_segment" -> TpchModels.createsBySegmentOracle,
    "q26_daily_payout" -> KreModels.dailyPayoutOracle,
    "q27_volatility_factor" -> KreModels.volatilityFactorOracle,
    "q28_active_user_balance" -> KreModels.activeUserBalanceOracle,
    "q29_kre_weekly_payout" -> KreModels.kreWeeklyPayoutOracle,
    "q30_gc_impacted_accounts" -> TpchModels.gcImpactedAccountsOracle,
    "q31_balance_buckets" -> ActivityModels.balanceBucketsOracle,
    "q32_monthly_inactive_wallets" -> ActivityModels.monthlyInactiveWalletsOracle,
    "d01_dedup_exact" -> DedupModels.dedupExactOracle,
    "d02_minhash_signatures" -> DedupModels.minhashSignaturesOracle,
    "d03_lsh_near_dup_pairs" -> DedupModels.lshNearDupPairsOracle,
    "d04_simhash16" -> DedupModels.simhash16Oracle,
    "d05_embedding_near_dup" -> SimilarityModels.embeddingNearDupPairsOracle,
    "d06_edit_distance_pairs" -> DedupModels.editDistancePairsOracle,
    "s01_cosine_topk" -> SimilarityModels.cosineTopKOracle,
    "s02_lsh_ann_buckets" -> SimilarityModels.lshAnnBucketsOracle,
    "t01_lang_profile" -> TextModels.langProfileOracle,
    "t02_lang_id_heuristic" -> TextModels.langIdHeuristicOracle,
    "t03_quality_score" -> TextModels.qualityScoreOracle,
    "t04_token_counts" -> TextModels.tokenCountsOracle,
    "t05_fingerprint_dedup" -> TextModels.fingerprintDedupOracle,
    "m01_media_meta_summary" -> graft.multimodal.MultimodalOps.mediaMetaSummaryOracle,
  )
}
