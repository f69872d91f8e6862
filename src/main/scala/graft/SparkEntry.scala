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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_fact_txn" -> TxnModels.factTxnOracle,
    "q02_daily_txn_summary" -> TxnModels.dailyTxnSummaryOracle,
  )
}
