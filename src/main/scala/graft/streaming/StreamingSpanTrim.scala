package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.models.DedupModels

/** Streaming twin of the curation pipeline's incremental SPAN-TRIM
  * stage (`runner.CurationPipeline.runIncremental` step 2c / d11's
  * exact-substring trim): newly crawled documents arrive as a file
  * stream and each one's REMOVAL POSITIONS — the 10-token window
  * starts whose spans a trimmer would cut — emit immediately. A window
  * occurrence is removed if
  *
  *   1. its gram already exists in the MATERIALIZED corpus gram table
  *      (`curation_span_grams`) — its first holder is historical, so
  *      the new occurrence is non-first by the doc_id-watermark
  *      argument (a stream-static left join, the streaming seat of the
  *      batch path's bloom-guarded keeper probe);
  *   2. it repeats WITHIN its own document beyond the document's first
  *      occurrence — computed entirely IN-ROW over the gram array
  *      (tokens → window grams → an exists() scan of the earlier
  *      array prefix), so no state store and no shuffle exist anywhere
  *      in the plan.
  *
  * Cross-document duplicates WITHIN one in-flight batch are the
  * periodic batch catch-up's job (which also appends the unseen grams
  * and folds the bloom sidecar) — the same division of labor the
  * segment twin documents: the stream answers "what would the trimmer
  * cut against everything the warehouse has seen", the closed-period
  * batch run owns batch-internal tie-breaks. On any batch without
  * new-vs-new duplicate grams the streamed removal set is EXACTLY the
  * batch incremental's (`removalPositionsOf(grams, Some(known))` —
  * StreamingSpanTrimSpec pins set equality and replays the trim).
  *
  * Scale: stateless map + one stream-static equi-join; the in-row
  * repeat scan is O(tokens²) worst case but doc-bounded (it never
  * touches the shuffle); removal rows are (long, int) pairs — the
  * binary-sized document text never leaves the first projection.
  */
object StreamingSpanTrim {

  /** The unstarted streaming plan: removal positions `(doc_id, i)` of
    * the document stream under `inputDir`, verdicted against the
    * static `knownGrams` frame (column `g` — typically the pipeline's
    * `curation_span_grams` table). */
  def removalStream(spark: SparkSession, inputDir: String,
      knownGrams: DataFrame): DataFrame = {
    import spark.implicits._
    val docs = spark.readStream
      .schema(StreamingSegmentDedup.docSchema).parquet(inputDir)
    val ts: Column = DedupModels.normTokens($"text")
    val garr = DedupModels.spanGramArr(ts)
    // mark within-doc repeats in-row: occurrence j repeats iff an
    // earlier array slot holds the same gram (the batch min(struct)
    // first-occurrence rule restricted to one document)
    val marked = docs.select($"doc_id",
      explode(transform(garr, (e, j) => struct(
        e.getField("i").as("i"), e.getField("g").as("g"),
        exists(slice(garr, lit(1), j),
          p => p.getField("g") === e.getField("g")).as("rep"))))
        .as("e"))
      .select($"doc_id", $"e.i".as("i"), $"e.g".as("g"), $"e.rep".as("rep"))
    marked
      .join(knownGrams.select($"g", lit(true).as("known")), Seq("g"), "left")
      .filter(coalesce($"rep", lit(false)) ||
        coalesce($"known", lit(false)))
      .select($"doc_id", $"i")
  }

  /** Run to completion over the files currently present, appending the
    * removal rows to `outDir` (the streamed analog of the spans the
    * batch incremental trims by). */
  def runAvailableNow(spark: SparkSession, inputDir: String,
      knownGrams: DataFrame, checkpointDir: String, outDir: String)
      : StreamingQuery = {
    removalStream(spark, inputDir, knownGrams).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
