package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse → serving-store replication: the engine's analog of
  * `snowflake_postgres_replicator.py` (SURVEY.md §2.1 S7, §3.3).
  *
  * Key semantics reproduced:
  *  - sink-side watermark: the incremental filter is computed from
  *    `max(date_key)` in the SINK, not the source
  *    (`snowflake_postgres_replicator.py:133-144`) — at-least-once with
  *    idempotence by date;
  *  - rename projection: the serving store gets camelCase column names
  *    (`load_scripts/postgres_replication/daily_models/dailySummaryApp.sql`);
  *  - full rebuild mode (replace) vs incremental append.
  *
  * The sink here is a parquet "serving" directory standing in for the
  * JDBC target; `df.write.format("jdbc")` swaps in with the same
  * watermark/rename logic (the write itself is then distributed across
  * executors — the reference funneled every row through one Python
  * driver, its stated scalability ceiling).
  */
final class Replicator(spark: SparkSession, servingDir: String) {
  import spark.implicits._

  def sinkPath(table: String): String = s"$servingDir/$table"

  private def sinkExists(table: String): Boolean =
    new java.io.File(sinkPath(table)).exists()

  /** Sink-side watermark: max date already served, or None. The sink
    * holds serving-side column names, so the watermark column defaults
    * to `dateKey` (explicit renames may map it elsewhere, e.g. `date`).
    */
  def sinkWatermark(table: String, watermarkCol: String = "dateKey")
      : Option[String] =
    if (!sinkExists(table)) None
    else {
      val r = spark.read.parquet(sinkPath(table))
        .agg(max(col(watermarkCol)).cast("string")).head()
      if (r.isNullAt(0)) None else Some(r.getString(0))
    }

  /** snake_case → camelCase, with explicit per-column overrides — the
    * API-facing rename projection. The reference's serving SQL renames
    * some columns beyond camelization (`dailySummaryApp.sql`:
    * `app_id as "index"`, `transaction_count as "totalDailyTransactions"`;
    * `krePayoutSummary.sql`: `date_key as "date"`), passed as `renames`.
    */
  def camelize(df: DataFrame,
      renames: Map[String, String] = Map.empty): DataFrame = {
    val renamed = df.columns.map { c =>
      val parts = c.split("_")
      val camel = parts.head +
        parts.tail.map(p => p.capitalize).mkString
      col(c).as(renames.getOrElse(c, camel))
    }
    df.select(renamed.toSeq: _*)
  }

  /** Replicate one model into the serving store. Incremental: append only
    * source rows with `date_key` newer than the sink watermark;
    * rebuild=true: full replace. Returns rows written.
    */
  def replicate(table: String, source: DataFrame,
      rebuild: Boolean = false,
      renames: Map[String, String] = Map.empty,
      watermarkCol: String = "dateKey"): Long = {
    val slice =
      if (rebuild) source
      else sinkWatermark(table, watermarkCol) match {
        case Some(wm) => source.filter($"date_key" > lit(wm))
        case None => source
      }
    val out = camelize(slice, renames)
    val n = out.count()
    if (rebuild || n > 0)
      out.write
        .mode(if (rebuild) SaveMode.Overwrite else SaveMode.Append)
        .parquet(sinkPath(table))
    else if (!sinkExists(table))
      // the reference's replicator always creates the target table —
      // materialize an empty schema-bearing sink so consumers resolve it
      out.write.mode(SaveMode.Overwrite).parquet(sinkPath(table))
    n
  }
}
