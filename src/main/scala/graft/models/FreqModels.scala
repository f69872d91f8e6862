package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based SCALE VARIANT of rolling heavy hitters — the
  * frequent-items sibling of the HLL ([[SketchModels]]) and KLL
  * ([[QuantileModels]]) tiers, built on the native LongsSketch
  * aggregates (`functions/FreqSketch.scala`).
  *
  * The exact path (t06's `TopKLongs`, q11's rank-filter) re-aggregates
  * per-key counts over every window it serves — fine per day, but a
  * ROLLING "top wallets over the trailing 30 days" re-shuffles 30 days
  * of per-wallet counts per anchor. The 100 TB fix is the family's
  * standard two-layer shape:
  *
  *  1. [[dailyWalletFreqSketches]] — one linear pass per day builds a
  *     per-date_key heavy-hitters sketch of wallet activity (≤8 KB at
  *     maxMapSize 1024). Incremental: each day appends ONE row
  *     (within-day aggregate keyed by date_key → exact watermark
  *     appends).
  *  2. [[rollingFromSketches]] — each anchor merges (lookback+1) sketch
  *     ROWS and reads its top-k: a daily 30-day refresh reads 30
  *     kilobyte rows instead of re-scanning 30 days of raw fact.
  *
  * Accuracy contract (`FreqSketchSpec` pins both): any wallet with true
  * 30-day count > the merged sketch's maximum error is REPORTED
  * (NO_FALSE_NEGATIVES), and every estimate e satisfies
  * true ≤ e ≤ true + maxError. The retained counter SET depends on
  * arrival order, so specs pin the bound, never the bytes. Not
  * oracle-checked (DuckDB has no frequent-items sketch), deliberately
  * NOT in `SparkEntry.queries` — the documented opt-in scale path
  * beside the exact operators, same layering as the HLL/KLL tiers.
  */
object FreqModels {

  /** Per-date_key heavy-hitters sketch of wallet txn activity + exact
    * row count. One shuffle on date_key; sketches partial-aggregate
    * map-side (object hash aggregate, serialized only at the shuffle
    * boundary). */
  def dailyWalletFreqSketches(factIn: DataFrame): DataFrame = {
    import factIn.sparkSession.implicits._
    factIn
      .select($"date_key", $"wallet_id")
      .groupBy($"date_key")
      .agg(
        call_function("freq_sketch_agg", $"wallet_id").as("sk_wallets"),
        count($"wallet_id").as("txn_count"))
  }

  /** Rolling (lookback+1)-day top-k wallets from the materialized
    * sketch table: explode each day's row to the anchors it serves,
    * merge per anchor, read the top-k structs. */
  def rollingFromSketches(daily: DataFrame, lookback: Int,
      k: Int = 10): DataFrame = {
    import daily.sparkSession.implicits._
    val days = daily.select($"date_key").distinct()
      .withColumnRenamed("date_key", "anchor_date")
    daily
      .withColumn("anchor_date",
        explode(sequence($"date_key", date_add($"date_key", lookback))))
      .join(broadcast(days), Seq("anchor_date"), "left_semi")
      .groupBy($"anchor_date")
      .agg(
        call_function("freq_merge_agg", $"sk_wallets").as("sk"),
        sum($"txn_count").as("txn_count"))
      .select(
        $"anchor_date".as("date_key"),
        call_function("freq_top_k", $"sk", lit(k)).as("top_wallets"),
        $"txn_count")
  }

  /** The two layers composed (dev/test convenience; in production the
    * runner materializes layer 1 and layer 2 reads the target). */
  def rollingTopWallets(factIn: DataFrame, lookback: Int,
      k: Int = 10): DataFrame =
    rollingFromSketches(dailyWalletFreqSketches(factIn), lookback, k)

  /** Token heavy hitters at corpus scale — the sketch path under t06's
    * exact per-language top tokens. Layer 1: per-(lang, shard) string
    * sketches over the SAME tokenization as the exact model
    * (`TextModels.toks`), one kilobyte row per shard; at 100 TB the
    * shards are the ingestion partitions, so building them is the
    * map side of t06's first groupBy with the vocabulary-sized shuffle
    * replaced by a fixed-size sketch per shard. */
  def tokenFreqSketches(docs: DataFrame,
      shardSize: Long = 100L): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"lang", expr(s"doc_id div $shardSize").as("shard"),
        explode(TextModels.toks($"text")).as("token"))
      .groupBy($"lang", $"shard")
      .agg(call_function("freq_str_sketch_agg", $"token").as("sk_tokens"))
  }

  /** Layer 2: merge each language's shard sketches, read top-k tokens
    * as (item, estimate, lower_bound) structs — |langs| kilobyte-row
    * groups, never the vocabulary. */
  def topTokensFromSketches(shardSketches: DataFrame,
      k: Int = 10): DataFrame = {
    import shardSketches.sparkSession.implicits._
    shardSketches
      .groupBy($"lang")
      .agg(call_function("freq_str_merge_agg", $"sk_tokens").as("sk"))
      .select($"lang",
        call_function("freq_str_top_k", $"sk", lit(k)).as("top_tokens"))
  }
}
