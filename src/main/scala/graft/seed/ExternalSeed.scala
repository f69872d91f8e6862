package graft.seed

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** External-data seeding: the engine's analog of the reference's
  * `external_endpoint_data_seed.py` (SURVEY.md §2.1 S5/S6) with the
  * network boundary factored out — callers fetch bytes however they
  * like (the reference used REST; tests use fixture strings) and these
  * builders own the parse/shape/publish semantics.
  */
object ExternalSeed {

  /** The network seam: url → response body. The reference's seeder
    * performs its own `requests.get` / CoinGecko-client calls with
    * retries (`external_endpoint_data_seed.py:80-89,173`); the sandbox
    * has no egress, so the engine factors the transport behind this
    * one-method interface — a production deployment passes an HTTP
    * client closure, tests and local runs pass fixture lookups.
    */
  type Fetcher = String => String

  /** Fetch with the reference's retry-until-parseable discipline: a
    * transport error OR a malformed/truncated JSON body (both are one
    * failure mode to `requests.get(...).json()`) consumes an attempt;
    * the first well-formed body wins. Validation is a driver-side
    * Jackson `readTree` over the single payload string — the payloads
    * are API responses (KBs), never data-plane volumes.
    */
  def fetchJson(fetch: Fetcher, url: String, attempts: Int = 3): String = {
    require(attempts > 0, "attempts must be positive")
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try {
        val body = fetch(url)
        new com.fasterxml.jackson.databind.ObjectMapper().readTree(body)
        return body
      } catch { case e: Exception => last = e }
      i += 1
    }
    throw new IllegalStateException(
      s"seed fetch failed after $attempts attempts: $url", last)
  }

  /** S5 end-to-end: fetch the app directory and build the dim —
    * the reference's `seed_dim_app` with the transport injected. */
  def seedDimApp(spark: SparkSession, fetch: Fetcher, url: String,
      attempts: Int = 3): DataFrame =
    seedDimAppFromJson(spark, fetchJson(fetch, url, attempts))

  /** The market-chart response shape: three (ts_millis, value) series
    * in one payload (`external_endpoint_data_seed.py:95-101` reads
    * `prices` / `market_caps` / `total_volumes` off the CoinGecko
    * response). */
  private val marketChartSchema: StructType = StructType(Seq(
    StructField("prices", ArrayType(ArrayType(DoubleType))),
    StructField("market_caps", ArrayType(ArrayType(DoubleType))),
    StructField("total_volumes", ArrayType(ArrayType(DoubleType)))))

  /** Parse one market-chart JSON payload into the three (ts, value)
    * frames [[buildPriceDim]] consumes. Timestamps arrive as millis
    * inside double-typed pairs (the API's JSON shape); they are exact
    * to well past 2100 in a double, cast back to long here.
    */
  def parseMarketChart(spark: SparkSession,
      json: String): (DataFrame, DataFrame, DataFrame) = {
    import spark.implicits._
    val parsed = Seq(json).toDF("payload")
      .select(from_json($"payload", marketChartSchema).as("r"))
    def series(field: String): DataFrame = parsed
      .select(explode(col(s"r.$field")).as("pair"))
      .select($"pair"(0).cast("long").as("ts"),
        $"pair"(1).as("value"))
    (series("prices"), series("market_caps"), series("total_volumes"))
  }

  /** S6 end-to-end: fetch the market chart and build the price dim —
    * the reference's CoinGecko seed with the transport injected. */
  def seedPriceDim(spark: SparkSession, fetch: Fetcher, url: String,
      attempts: Int = 3): DataFrame = {
    val (p, m, v) = parseMarketChart(spark, fetchJson(fetch, url, attempts))
    buildPriceDim(spark, p, m, v)
  }

  /** S5: app-directory JSON payload → dim table. Reproduces the
    * `PARSE_JSON` + lateral `FLATTEN` + `trim(value:name,'"')` pipeline
    * (`external_endpoint_data_seed.py:46-71,144-149`): Spark-side this is
    * `from_json(ArrayType(...))` + `explode` (the Generator FLATTEN maps
    * to) + per-field extraction.
    */
  val appSchema: StructType = StructType(Seq(
    StructField("id", IntegerType),
    StructField("name", StringType),
    StructField("status", StringType),
    StructField("public_wallet", StringType),
    StructField("created_date", StringType),
    StructField("updated_date", StringType)))

  def seedDimAppFromJson(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    Seq(json).toDF("payload")
      .select(explode(from_json($"payload", ArrayType(appSchema)))
        .as("app"))
      .select(
        $"app.id".as("id"),
        // the reference trims stray quotes the API leaves in names
        trim($"app.name", "\"").as("name"),
        $"app.status".as("status"),
        $"app.public_wallet".as("public_wallet"),
        to_date($"app.created_date").as("created_date"),
        to_date($"app.updated_date").as("updated_date"))
  }

  /** S6: market-chart series merge → price dim. Reproduces the CoinGecko
    * seed (`external_endpoint_data_seed.py:74-120`): three per-key series
    * (prices / market_caps / total_volumes, each (ts_millis, value))
    * joined on timestamp; `date_key` shifted −1 day (a close at 00:00 UTC
    * describes the PREVIOUS day); the max-timestamp row (open period) is
    * dropped.
    *
    * Scale: the three-way join is on the same key with tiny daily rows —
    * Catalyst broadcasts; the open-row filter uses a max over a window
    * of the whole (small) series rather than a driver collect.
    */
  def buildPriceDim(spark: SparkSession, prices: DataFrame,
      marketCaps: DataFrame, totalVolumes: DataFrame): DataFrame = {
    import spark.implicits._
    val joined = prices.select($"ts", $"value".as("prices"))
      .join(marketCaps.select($"ts", $"value".as("market_caps")), Seq("ts"))
      .join(totalVolumes.select($"ts", $"value".as("total_volumes")), Seq("ts"))
    val w = Window.partitionBy(lit(1))
    joined
      .withColumn("max_ts", max($"ts").over(w))
      .filter($"ts" < $"max_ts") // drop the open (still-running) period
      .select(
        to_date(timestamp_millis($"ts") - expr("INTERVAL 1 DAY"))
          .as("date_key"),
        $"prices", $"market_caps", $"total_volumes")
  }

  /** S6, incremental: the watermark variant the reference never shipped
    * (its seed refetches FULL history every run; the comment at
    * `external_endpoint_data_seed.py:83-89` flags making the call
    * incremental as unfinished work). Callers fetch
    * only a recent window of the three series (the API supports
    * `days=N`), parse it through the same [[buildPriceDim]] semantics,
    * and this returns ONLY the closed-period rows above the existing
    * dim's date watermark — the slice to append, matching the runner's
    * high-watermark convention (`IncrementalRunner`). Already-loaded
    * days are never rewritten, so a daily seed appends one row instead
    * of rebuilding years of history.
    */
  def buildPriceDimIncrement(spark: SparkSession, existing: DataFrame,
      prices: DataFrame, marketCaps: DataFrame,
      totalVolumes: DataFrame): DataFrame = {
    import spark.implicits._
    val fresh = buildPriceDim(spark, prices, marketCaps, totalVolumes)
    val wm = existing.agg(max($"date_key").as("max_loaded"))
    // Fail loudly if the caller's refetch window starts AFTER
    // max_loaded + 1 day: under the append-only convention the skipped
    // days would never be backfilled, so a too-short fetch window must
    // error now rather than leave a permanent hole. The check rides the
    // filter predicate (raise_error is not prunable there); the min is a
    // whole-frame window over the tiny daily series, same as max_ts in
    // [[buildPriceDim]].
    val wAll = Window.partitionBy(lit(1))
    fresh
      .withColumn("min_fresh", min($"date_key").over(wAll))
      .crossJoin(broadcast(wm)) // one-row watermark frame, no collect
      .filter(
        when($"max_loaded".isNotNull && $"min_fresh" > date_add($"max_loaded", 1),
          raise_error(concat(
            lit("price-dim increment gap: fresh window starts at "),
            $"min_fresh", lit(" but existing dim is loaded through "),
            $"max_loaded",
            lit(" — days in between would never be backfilled; widen the fetch window")))
            .cast("boolean"))
          .otherwise($"max_loaded".isNull || $"date_key" > $"max_loaded"))
      .drop("max_loaded", "min_fresh")
  }
}
