package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data CURATION operators over `documents` — the pipeline
  * stages that sit around dedup in a real LLM data build (beyond the
  * reference's surface, like `DedupModels`):
  *
  *  - benchmark DECONTAMINATION (c01): cross-set n-gram containment —
  *    which corpus documents contain n-grams from a held-out eval set.
  *    Asymmetric by construction, unlike d03's symmetric near-dup: a
  *    10-token eval answer hiding inside a 10k-token web page is
  *    invisible to Jaccard (tiny union overlap) but is exactly what
  *    decontamination must catch.
  *  - deterministic STRATIFIED SAMPLING (c02): hash-bucket sampling at
  *    per-stratum rates (language mixing) — reproducible across runs
  *    and engines because the "randomness" is an md5 of the stable key,
  *    never an RNG.
  *  - REPETITION SIGNALS (c03): within-document repetition quality
  *    filtering (Gopher-style) — type/token ratio, longest same-token
  *    run, duplicate-bigram fraction — computed entirely with
  *    higher-order array functions so the whole operator is a
  *    zero-shuffle map over the corpus.
  *  - CHUNKING (c04): overlapping fixed-width token windows — the
  *    "split long documents into training-sample-sized pieces" stage.
  *    A bounded generator (fan-out ≤ n/stride per doc), map-side only.
  *  - SEQUENCE PACKING (c05): the GPT-pretraining packing index —
  *    concatenate each (lang, shard) stream in stable doc order and
  *    assign every document its token-offset interval and the
  *    fixed-budget training sequences it lands in (documents crossing
  *    a sequence boundary are flagged, exactly where a packer splits).
  *
  * All hash math is md5-builtin (DedupModels' convention) so every
  * operator stays oracle-checkable end-to-end.
  *
  * Scale: c01's join is gram-hash equi (shuffle keyed on the digest —
  * uniformly distributed, no skew); the eval side is |eval|-bounded and
  * AQE broadcasts it when it fits, while corpus grams stream through a
  * distinct + count — never an all-pairs compare. c02/c03/c04 are pure
  * map-side projections/generators: zero shuffles beyond the
  * aggregate-free write. c05's only shuffle is the window partition on
  * (lang, shard); shards are size-bounded by construction (`PackShard`
  * docs), so no window partition ever exceeds a fixed row count no
  * matter how large the corpus — packing a petabyte is embarrassingly
  * parallel across shards.
  */
object CurationModels {
  import graft.catalog.Tables
  import DedupModels.{normText, tokens, normSqlDuck}

  /** The held-out "benchmark" slice of the fixture: one source column
    * value — deterministic and non-empty at every SF. */
  private[graft] val EvalSource = "src0"
  private val N = 5 // word n-gram width for containment

  /** Distinct (doc_id, source, gram-md5) triples; docs shorter than N
    * tokens carry no grams (nothing to match on). */
  private[graft] def gramsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"source", tokens($"text").as("toks"))
      .filter(size($"toks") >= N)
      .select($"doc_id", $"source",
        explode(transform(sequence(lit(1), size($"toks") - (N - 1)),
          i => md5(concat_ws(" ",
            (0 until N).map(o => element_at($"toks", i + o)): _*))))
          .as("gram"))
      .distinct()
  }

  /** Session-memoized (doc_id, source, gram-digest) table: the eval,
    * corpus, and hit legs of c01's build all read this one
    * materialization instead of re-deriving the gram explode per plan
    * branch (the shingle-digest convention of `DedupModels`). */
  private def gramDf(spark: SparkSession, sfDir: String): DataFrame =
    Shared.materialized("gram_digests", spark, sfDir)(
      gramsOf(Tables.documents(spark, sfDir)))

  /** The distinct eval-slice gram set — the fixed reference an
    * incremental curation run checks new documents against
    * (`CurationPipeline` materializes it once at snapshot time). */
  private[graft] def evalGramsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    gramsOf(docs.filter($"source" === EvalSource))
      .select($"gram").distinct()
  }

  /** Contamination of `corpusDocs` against a pre-built eval gram set —
    * the incremental twin of [[decontamination]]'s hits/totals algebra
    * (same flag rule; inner join, so only contaminated docs appear). */
  private[graft] def contaminationOf(corpusDocs: DataFrame,
      evalGrams: DataFrame): DataFrame = {
    import corpusDocs.sparkSession.implicits._
    val grams = gramsOf(corpusDocs)
    val totals = grams.groupBy($"doc_id")
      .agg(count(lit(1)).as("total_ngrams"))
    val hits = grams.join(evalGrams, Seq("gram"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("hit_ngrams"))
    totals.join(hits, Seq("doc_id"))
      .withColumn("flagged", $"hit_ngrams" * 5 >= $"total_ngrams")
      .select($"doc_id", $"flagged")
  }

  /** c01: corpus documents contaminated by eval n-grams — per flagged
    * doc: its distinct-gram total, how many grams also occur anywhere
    * in the eval slice, the containment ratio (exact integer micros),
    * and a review flag at ≥20% containment (integer compare, no
    * float threshold drift).
    */
  def decontamination(spark: SparkSession, sfDir: String): DataFrame =
    // session-memoized: c01 and the funnel's contamination leg (c06)
    // share one materialization (the runner's materialized-model role,
    // same as the KRE chain in Shared)
    Shared.materialized("c01_decontamination", spark, sfDir)(
      decontaminationBuild(spark, sfDir))

  private def decontaminationBuild(spark: SparkSession,
      sfDir: String): DataFrame = {
    import spark.implicits._
    val grams = gramDf(spark, sfDir)
    val evalGrams = grams.filter($"source" === EvalSource)
      .select($"gram").distinct()
    val corpus = grams.filter($"source" =!= EvalSource)
    val totals = corpus.groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("total_ngrams"))
    val hits = corpus
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("hit_ngrams"))
    totals.join(hits, Seq("doc_id")) // inner: only contaminated docs
      .withColumn("contamination",
        (expr("cast(hit_ngrams * 1000000 as bigint) div total_ngrams")
          .cast(DecimalType(20, 0)) *
          lit(new java.math.BigDecimal("0.000001")).cast(DecimalType(7, 6)))
          .cast(DecimalType(24, 6)))
      .withColumn("flagged", $"hit_ngrams" * 5 >= $"total_ngrams")
      .select($"doc_id", $"source", $"total_ngrams", $"hit_ngrams",
        $"contamination", $"flagged")
  }

  val decontaminationOracle: String =
    s"""WITH docs AS (SELECT doc_id, source,
       |                     string_split($normSqlDuck, ' ') AS toks
       |              FROM documents),
       |ok AS (SELECT * FROM docs WHERE len(toks) >= $N),
       |grams AS (SELECT DISTINCT doc_id, source,
       |                 md5(toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3] ||
       |                     ' ' || toks[i+4] || ' ' || toks[i+5]) AS gram
       |          FROM (SELECT *, unnest(range(len(toks) - ${N - 1})) AS i FROM ok)),
       |evalg AS (SELECT DISTINCT gram FROM grams WHERE source = '$EvalSource'),
       |corpus AS (SELECT * FROM grams WHERE source <> '$EvalSource'),
       |totals AS (SELECT doc_id, source, count(*) AS total_ngrams
       |           FROM corpus GROUP BY 1, 2),
       |hits AS (SELECT c.doc_id, count(*) AS hit_ngrams
       |         FROM corpus c JOIN evalg e ON c.gram = e.gram
       |         GROUP BY 1)
       |SELECT t.doc_id, t.source, t.total_ngrams, h.hit_ngrams,
       |       cast((cast(h.hit_ngrams * 1000000 AS BIGINT) // t.total_ngrams) *
       |            cast(0.000001 AS DECIMAL(7,6)) AS DECIMAL(24,6)) AS contamination,
       |       h.hit_ngrams * 5 >= t.total_ngrams AS flagged
       |FROM totals t JOIN hits h ON t.doc_id = h.doc_id""".stripMargin

  /** Per-language keep thresholds out of 256 hash buckets — the "data
    * mixing" knob: downsample the dominant language (en: 50%),
    * lightly trim zh (75%), keep the rest whole. */
  private val Per256: Seq[(String, Int)] =
    Seq("en" -> 128, "zh" -> 192)
  private val DefaultPer256 = 256

  /** c02: deterministic stratified sample — each doc lands in one of
    * 256 buckets via the first md5 byte of its stable key, and is kept
    * iff bucket < its language's threshold. Reproducible across runs,
    * engines, and partitionings (no RNG, no row order dependence);
    * sampling a petabyte is a stateless map over the corpus.
    */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame =
    stratifiedSampleFrom(Tables.documents(spark, sfDir))

  /** The c02 hash bucket of a doc id (0–255, first md5 byte). */
  private[graft] def sampleBucket(docId: Column): Column = {
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(IntegerType)
    val h = md5(docId.cast(StringType))
    hexVal(substring(h, 1, 1)) * 16 + hexVal(substring(h, 2, 1))
  }

  /** The c02 keep coin as a single in-row Column — shared by the batch
    * sampler and the streaming verdict twin (one coin, one idiom). */
  private[graft] def sampleKept(docId: Column, lang: Column): Column = {
    val threshold = Per256.foldRight(lit(DefaultPer256): Column) {
      case ((l, t), acc) => when(lang === l, lit(t)).otherwise(acc)
    }
    sampleBucket(docId) < threshold
  }

  /** Frame-parameterized variant (stateless per-doc map — incremental
    * runs feed only the NEW documents through it). */
  def stratifiedSampleFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", $"lang",
        sampleBucket($"doc_id").cast(LongType).as("bucket"),
        sampleKept($"doc_id", $"lang").as("kept"))
  }

  val stratifiedSampleOracle: String =
    s"""WITH h AS (SELECT doc_id, lang, md5(cast(doc_id AS VARCHAR)) AS h
       |           FROM documents),
       |b AS (SELECT doc_id, lang,
       |             (strpos('0123456789abcdef', substr(h,1,1)) - 1) * 16 +
       |             (strpos('0123456789abcdef', substr(h,2,1)) - 1) AS bucket
       |      FROM h)
       |SELECT doc_id, lang, cast(bucket AS BIGINT) AS bucket,
       |       bucket < (CASE lang WHEN 'en' THEN 128
       |                           WHEN 'zh' THEN 192
       |                           ELSE 256 END) AS kept
       |FROM b""".stripMargin

  /** c03: within-document repetition signals (the Gopher-style quality
    * filter family). Per document with ≥2 tokens:
    *  - `total_tokens` / `distinct_tokens` — type/token ratio raw parts;
    *  - `top_token_count` — the longest run in the SORTED token array,
    *    i.e. the highest single-token frequency, computed with one
    *    `aggregate()` fold (no explode, no shuffle);
    *  - `total_bigrams` / `distinct_bigrams` — duplicate-bigram mass;
    *  - `ttr_micros` / `dup_bigram_micros` — exact integer micros (the
    *    repo's no-float-drift idiom, see c01);
    *  - `flagged` — repetitive iff TTR < 1/2 OR the top token exceeds
    *    1/5 of the document (integer compares only).
    *
    * Scale: every column derives from the doc's own token array via
    * higher-order functions — the operator is a stateless map; at
    * 100 TB it pipelines inside the scan with no exchange at all.
    */
  /** Session-memoized (`Shared.materialized`): the per-doc signal table
    * is read standalone (c03) AND as the funnel's `rep_flagged` leg
    * (c06) — and the per-doc expressions (sorted-run fold, bigram
    * explode) are the expensive part, so one materialization replaces
    * two full corpus evaluations (the c01 precedent). */
  def repetitionSignals(spark: SparkSession, sfDir: String): DataFrame =
    Shared.materialized("c03_repetition_signals", spark, sfDir) {
      repetitionSignalsFrom(Tables.documents(spark, sfDir))
    }

  /** Frame-parameterized variant (per-doc — incremental runs feed only
    * the NEW documents through it). */
  def repetitionSignalsFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .withColumn("total_tokens", size($"toks").cast(LongType))
      .withColumn("distinct_tokens",
        size(array_distinct($"toks")).cast(LongType))
      .withColumn("top_token_count", expr(
        """aggregate(sort_array(toks),
          |  named_struct('prev', cast(null as string), 'run', 0L, 'mx', 0L),
          |  (s, t) -> named_struct(
          |    'prev', t,
          |    'run', if(s.prev <=> t, s.run + 1L, 1L),
          |    'mx', greatest(s.mx, if(s.prev <=> t, s.run + 1L, 1L))),
          |  s -> s.mx)""".stripMargin))
      .withColumn("bigrams", expr(
        """transform(sequence(1, size(toks) - 1),
          |  i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""
          .stripMargin))
      .withColumn("total_bigrams", size($"bigrams").cast(LongType))
      .withColumn("distinct_bigrams",
        size(array_distinct($"bigrams")).cast(LongType))
      .withColumn("ttr_micros",
        expr("distinct_tokens * 1000000L div total_tokens"))
      .withColumn("dup_bigram_micros",
        expr("(total_bigrams - distinct_bigrams) * 1000000L div total_bigrams"))
      .withColumn("flagged",
        $"distinct_tokens" * 2 < $"total_tokens" ||
          $"top_token_count" * 5 > $"total_tokens")
      .select($"doc_id", $"total_tokens", $"distinct_tokens",
        $"top_token_count", $"total_bigrams", $"distinct_bigrams",
        $"ttr_micros", $"dup_bigram_micros", $"flagged")
  }

  val repetitionSignalsOracle: String =
    s"""WITH docs AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS toks
       |              FROM documents),
       |ok AS (SELECT * FROM docs WHERE len(toks) >= 2),
       |tok AS (SELECT doc_id, unnest(toks) AS tok FROM ok),
       |tf AS (SELECT doc_id, max(cnt) AS top_token_count
       |       FROM (SELECT doc_id, tok, count(*) AS cnt
       |             FROM tok GROUP BY 1, 2) GROUP BY 1),
       |big AS (SELECT doc_id, count(*) AS total_bigrams,
       |               count(DISTINCT g) AS distinct_bigrams
       |        FROM (SELECT doc_id, toks[i+1] || ' ' || toks[i+2] AS g
       |              FROM (SELECT doc_id, toks,
       |                           unnest(range(len(toks) - 1)) AS i FROM ok))
       |        GROUP BY 1),
       |base AS (SELECT doc_id, len(toks) AS total_tokens,
       |                len(list_distinct(toks)) AS distinct_tokens FROM ok)
       |SELECT b.doc_id,
       |       cast(b.total_tokens AS BIGINT) AS total_tokens,
       |       cast(b.distinct_tokens AS BIGINT) AS distinct_tokens,
       |       cast(t.top_token_count AS BIGINT) AS top_token_count,
       |       cast(g.total_bigrams AS BIGINT) AS total_bigrams,
       |       cast(g.distinct_bigrams AS BIGINT) AS distinct_bigrams,
       |       cast(b.distinct_tokens * 1000000 // b.total_tokens AS BIGINT)
       |         AS ttr_micros,
       |       cast((g.total_bigrams - g.distinct_bigrams) * 1000000
       |            // g.total_bigrams AS BIGINT) AS dup_bigram_micros,
       |       (b.distinct_tokens * 2 < b.total_tokens) OR
       |       (t.top_token_count * 5 > b.total_tokens) AS flagged
       |FROM base b JOIN tf t USING (doc_id) JOIN big g USING (doc_id)"""
      .stripMargin

  /** Chunk geometry: windows of `ChunkW` tokens every `ChunkS` tokens
    * (overlap = W − S), plus a final short tail; a doc of ≤W tokens is
    * one chunk. */
  private val ChunkW = 32
  private val ChunkS = 24

  /** c04: overlapping token-window chunking — split each document into
    * training-sample-sized pieces. Chunk k covers tokens
    * [k·S, min(k·S+W, n)); the chunk count is 1 + ceil((n−W)/S) for
    * n>W else 1, so fan-out is bounded by n/S + 1 rows per doc.
    * `chunk_hash` fingerprints the rejoined window (md5, the repo's
    * oracle-checkable hash convention).
    *
    * Scale: a pure generator (`explode(sequence(...))` + `slice`) —
    * map-side, no shuffle; chunk rows stream straight to the sink.
    */
  def chunkWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("k", explode(expr(
        s"""sequence(0, if(size(toks) <= $ChunkW, 0L,
           |  (size(toks) - $ChunkW + $ChunkS - 1) div $ChunkS))"""
          .stripMargin)))
      .withColumn("chunk", expr(s"slice(toks, int(k) * $ChunkS + 1, $ChunkW)"))
      .select($"doc_id",
        $"k".cast(LongType).as("chunk_index"),
        ($"k" * ChunkS).cast(LongType).as("chunk_start"),
        size($"chunk").cast(LongType).as("chunk_tokens"),
        md5(concat_ws(" ", $"chunk")).as("chunk_hash"))
  }

  val chunkWindowsOracle: String =
    s"""WITH docs AS (SELECT doc_id, string_split($normSqlDuck, ' ') AS toks
       |              FROM documents),
       |d2 AS (SELECT doc_id, toks, len(toks) AS n FROM docs),
       |ks AS (SELECT doc_id, toks, n,
       |              unnest(range(CASE WHEN n <= $ChunkW THEN 1
       |                    ELSE (n - $ChunkW + $ChunkS - 1) // $ChunkS + 1
       |                    END)) AS k
       |       FROM d2),
       |c AS (SELECT doc_id, k,
       |             toks[k*$ChunkS + 1 : k*$ChunkS + $ChunkW] AS chunk
       |      FROM ks)
       |SELECT doc_id,
       |       cast(k AS BIGINT) AS chunk_index,
       |       cast(k*$ChunkS AS BIGINT) AS chunk_start,
       |       cast(len(chunk) AS BIGINT) AS chunk_tokens,
       |       md5(array_to_string(chunk, ' ')) AS chunk_hash
       |FROM c""".stripMargin

  /** Packing geometry: training sequences of `PackBudget` tokens; the
    * corpus is packed per (lang, shard) stream, shard = doc_id div
    * `PackShard` — every window partition is ≤ PackShard rows by
    * construction. */
  private[graft] val PackBudget = 256L
  private[graft] val PackShard = 200L

  /** c05: sequence-packing index — the GPT-pretraining packing stage as
    * a deterministic index, over the SPAN-TRIMMED corpus (d11): the
    * duplicated token mass d10 measures is removed before packing, so
    * offsets count only tokens a training run would actually see.
    * Documents are concatenated in stable doc_id order within each
    * (lang, shard) stream; each doc gets its token-offset interval
    * [start_offset, start_offset + n_tokens) and the fixed-budget
    * sequences it lands in (`first_seq`/`last_seq` = offset div
    * budget). `boundary_split` marks docs a packer would split across
    * two training sequences.
    *
    * Scale: one running-sum window partitioned on (lang, shard). The
    * shard key bounds every partition at `PackShard` docs, so the sort
    * inside each window partition is constant-sized regardless of
    * corpus size — the classic fix for the "global ordered cumsum"
    * single-partition trap (offsets restart per shard, which is exactly
    * how a production packer shards work anyway).
    */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame =
    packSequencesFrom(trimmedDocs(spark, sfDir))

  /** The span-trimmed corpus (d11) packing reads — duplicated spans
    * are REMOVED before sequences are packed, so the duplicated token
    * mass d10 measures never reaches the training stream (Lee et al.
    * 2022's point). Session-materialized once per (session, sfDir), the
    * in-JVM analog of the pipeline's `span_trimmed_corpus` table; every
    * packing consumer (c05/c08/c12) reads the same parquet. */
  private def trimmedDocs(spark: SparkSession, sfDir: String): DataFrame =
    Shared.materialized("span_trimmed_docs", spark, sfDir) {
      // builds from the session-materialized span-gram stream (shared
      // with d10/d11) — the corpus explode runs once per session and
      // nothing token-grain is ever executor-cached
      DedupModels.spanTrimmed(spark, sfDir)
    }

  /** Frame-parameterized variant — incremental packing re-runs this
    * over ONLY the (lang, shard) streams new documents touched
    * (offsets restart per shard, so untouched streams are immutable).
    */
  def packSequencesFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lang", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select($"doc_id", $"lang",
        expr(s"doc_id div $PackShard").as("shard"),
        size(tokens($"text")).cast(LongType).as("n_tokens"))
      .withColumn("end_offset", sum($"n_tokens").over(w))
      .withColumn("start_offset", $"end_offset" - $"n_tokens")
      .withColumn("first_seq", expr(s"start_offset div $PackBudget"))
      .withColumn("last_seq", expr(s"(end_offset - 1) div $PackBudget"))
      .select($"doc_id", $"lang", $"shard", $"n_tokens", $"start_offset",
        $"first_seq", $"last_seq",
        ($"last_seq" > $"first_seq").as("boundary_split"))
  }

  val packSequencesOracle: String =
    s"""WITH ${DedupModels.spanTrimSqlCtes},
       |d AS (SELECT doc_id, lang, doc_id // $PackShard AS shard,
       |             len(string_split(text, ' ')) AS n_tokens
       |      FROM trimmed),
       |o AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard
       |              ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |              AND CURRENT ROW) AS end_offset
       |      FROM d)
       |SELECT doc_id, lang, cast(shard AS BIGINT) AS shard,
       |       cast(n_tokens AS BIGINT) AS n_tokens,
       |       cast(end_offset - n_tokens AS BIGINT) AS start_offset,
       |       cast((end_offset - n_tokens) // $PackBudget AS BIGINT)
       |         AS first_seq,
       |       cast((end_offset - 1) // $PackBudget AS BIGINT) AS last_seq,
       |       (end_offset - 1) // $PackBudget >
       |       (end_offset - n_tokens) // $PackBudget AS boundary_split
       |FROM o""".stripMargin

  /** c07: TEMPERATURE-FLATTENED language mixing (T = 2) — the data-mix
    * knob a multilingual pretraining build turns after filtering: where
    * c02 applies fixed per-language keep rates, this derives each
    * language's target weight from the corpus itself,
    * `w_l ∝ sqrt(share_l)` (the classic T=2 flattening: dominant
    * languages downsample, rare ones upsample), and emits a per-doc
    * REPLICATION INDEX: `n_copies` = how many times the doc appears in
    * the mixed training stream (floor of the repeat factor, plus one
    * more with probability = its fractional part, decided by the doc's
    * md5 bucket — deterministic, engine-independent, no RNG).
    *
    * Cross-engine exactness is by construction: sqrt and double
    * division are IEEE-correctly-rounded (bit-identical in any
    * engine); the only order-sensitive step — normalizing over
    * languages — sums 6dp DECIMAL weights (exact, order-free); the
    * stochastic-rounding compare is an integer cross-multiply
    * (`bucket · 10^6 < frac_micros · 65536`), no float threshold.
    *
    * Scale: one tiny language aggregate broadcast back over the
    * corpus — a stateless map otherwise; the replication index (not
    * exploded copies) is what ships, so the operator's output is
    * corpus-sized regardless of the repeat factors.
    */
  def temperatureMix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(LongType)
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"lang")
    // the language table is |langs| rows — the lit(1) windows are fine
    val w = Window.partitionBy(lit(1))
    val langStats = docs.groupBy($"lang")
      .agg(count(lit(1)).as("n_l"))
      .withColumn("n_total", sum($"n_l").over(w))
      .withColumn("share",
        $"n_l".cast(DoubleType) / $"n_total".cast(DoubleType))
      .withColumn("w6", round(sqrt($"share"), 6).cast(DecimalType(10, 6)))
      .withColumn("w_sum", sum($"w6").over(w))
      .withColumn("repeat6", round(
        ($"w6".cast(DoubleType) / $"w_sum".cast(DoubleType)) / $"share", 6))
      .select($"lang",
        expr("n_l * 1000000L div n_total").as("share_micros"),
        $"w6".cast(DoubleType).as("mix_weight"), $"repeat6")
    docs.join(broadcast(langStats), Seq("lang"))
      .withColumn("h", md5($"doc_id".cast(StringType)))
      // 16-bit bucket from the first 4 hex digits (c02's derivation, ×2)
      .withColumn("bucket",
        hexVal(substring($"h", 1, 1)) * 4096 +
          hexVal(substring($"h", 2, 1)) * 256 +
          hexVal(substring($"h", 3, 1)) * 16 + hexVal(substring($"h", 4, 1)))
      .withColumn("frac_micros",
        round(($"repeat6" - floor($"repeat6")) * 1e6).cast(LongType))
      .withColumn("n_copies",
        floor($"repeat6") +
          when($"bucket" * 1000000L < $"frac_micros" * 65536L, 1L)
            .otherwise(0L))
      .select($"doc_id", $"lang", $"share_micros", $"mix_weight",
        $"repeat6".as("repeat_factor"), $"n_copies")
  }

  val temperatureMixOracle: String =
    """WITH counts AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
      |tot AS (SELECT lang, n_l, sum(n_l) OVER () AS n_total FROM counts),
      |wt AS (SELECT lang, n_l, n_total,
      |              cast(n_l AS DOUBLE) / cast(n_total AS DOUBLE) AS share,
      |              cast(round(sqrt(cast(n_l AS DOUBLE) / cast(n_total AS DOUBLE)), 6)
      |                   AS DECIMAL(10,6)) AS w6
      |       FROM tot),
      |ws AS (SELECT *, sum(w6) OVER () AS w_sum FROM wt),
      |ls AS (SELECT lang,
      |              n_l * 1000000 // n_total AS share_micros,
      |              cast(w6 AS DOUBLE) AS mix_weight,
      |              round((cast(w6 AS DOUBLE) / cast(w_sum AS DOUBLE)) / share, 6)
      |                AS repeat6
      |       FROM ws),
      |b AS (SELECT d.doc_id, d.lang, ls.share_micros, ls.mix_weight,
      |             ls.repeat6,
      |             (strpos('0123456789abcdef', substr(md5(cast(d.doc_id AS VARCHAR)),1,1)) - 1) * 4096 +
      |             (strpos('0123456789abcdef', substr(md5(cast(d.doc_id AS VARCHAR)),2,1)) - 1) * 256 +
      |             (strpos('0123456789abcdef', substr(md5(cast(d.doc_id AS VARCHAR)),3,1)) - 1) * 16 +
      |             (strpos('0123456789abcdef', substr(md5(cast(d.doc_id AS VARCHAR)),4,1)) - 1) AS bucket,
      |             cast(round((ls.repeat6 - floor(ls.repeat6)) * 1000000) AS BIGINT) AS frac_micros
      |      FROM documents d JOIN ls ON d.lang = ls.lang)
      |SELECT doc_id, lang, cast(share_micros AS BIGINT) AS share_micros,
      |       mix_weight, repeat6 AS repeat_factor,
      |       cast(floor(repeat6) AS BIGINT) +
      |       CASE WHEN bucket * 1000000 < frac_micros * 65536
      |            THEN 1 ELSE 0 END AS n_copies
      |FROM b""".stripMargin

  /** c06: the curation FUNNEL — the end-to-end keep/drop decision a
    * training-data build materializes before packing, composed from the
    * tier's own stages. Per document:
    *
    *  - `is_duplicate` — not the canonical (min-doc_id) representative
    *    of its exact-dedup fingerprint group (d01);
    *  - `rep_flagged` — repetition quality filter fired (c03; docs too
    *    short for bigrams pass by definition);
    *  - `contaminated` — benchmark decontamination fired at the review
    *    threshold (c01; docs with zero eval-gram hits pass);
    *  - `sem_contaminated` — embedding-space decontamination fired
    *    (c11; within-IVF-cell cosine to an eval doc ≥ τ — the
    *    paraphrased-leakage tier c01's token overlap can't see);
    *  - `sample_kept` — survived the deterministic language-mix
    *    downsampling (c02);
    *  - `verdict` — the FIRST failing stage in pipeline order
    *    (eval → duplicate → repetitive → contaminated →
    *    sem_contaminated → sampled_out), else 'kept'. The eval slice
    *    itself is excluded from training by construction.
    *
    * Downstream, `packSequences` over `verdict = 'kept'` is the curated
    * corpus (composition shown in CurationSpec).
    *
    * Scale: every leg is doc-keyed (uniform join keys, no skew) and
    * itself scale-shaped (see each stage's note); the funnel adds three
    * hash joins on doc_id and one on the 32-hex fingerprint — all
    * shuffle-partitionable, nothing quadratic, no driver-side state.
    */
  /** (doc_id, lang, source, fp) — the exact-dedup fingerprint the
    * funnel (and the incremental pipeline's group bookkeeping) keys on.
    */
  /** The exact-dedup fingerprint as a single in-row Column — shared by
    * [[fingerprintsOf]] and the streaming verdict twin. */
  private[graft] def fpCol(text: Column): Column = md5(normText(text))

  private[graft] def fingerprintsOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id", $"lang", $"source", fpCol($"text").as("fp"))
  }

  def curationFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = fingerprintsOf(Tables.documents(spark, sfDir))
    val canon = DedupModels.dedupExact(spark, sfDir)
      .select($"fingerprint".as("fp"), $"canonical_doc_id")
    val rep = repetitionSignals(spark, sfDir)
      .select($"doc_id", $"flagged".as("rep_flagged"))
    val cont = decontamination(spark, sfDir)
      .select($"doc_id", $"flagged".as("cont_flagged"))
    // c11's embedding-space tier: catches paraphrased eval leakage the
    // token-overlap stage above can't see (only flagged docs appear)
    val sem = SimilarityModels.semanticDecontamination(spark, sfDir)
      .select($"doc_id", lit(true).as("sem_flag"))
    val samp = stratifiedSample(spark, sfDir)
      .select($"doc_id", $"kept")
    docs
      .join(canon, Seq("fp"))
      .join(rep, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .join(sem, Seq("doc_id"), "left")
      .join(samp, Seq("doc_id"))
      .withColumn("is_duplicate", $"doc_id" =!= $"canonical_doc_id")
      .withColumn("rep_flagged", coalesce($"rep_flagged", lit(false)))
      .withColumn("contaminated", coalesce($"cont_flagged", lit(false)))
      .withColumn("sem_contaminated", coalesce($"sem_flag", lit(false)))
      .withColumn("sample_kept", $"kept")
      .withColumn("verdict",
        when($"source" === EvalSource, "eval")
          .when($"is_duplicate", "duplicate")
          .when($"rep_flagged", "repetitive")
          .when($"contaminated", "contaminated")
          .when($"sem_contaminated", "sem_contaminated")
          .when(!$"sample_kept", "sampled_out")
          .otherwise("kept"))
      .select($"doc_id", $"lang", $"source", $"is_duplicate",
        $"rep_flagged", $"contaminated", $"sem_contaminated",
        $"sample_kept", $"verdict")
  }

  // LAZY: embeds SimilarityModels.semanticDecontaminationOracle while
  // that object's oracle reads back CurationModels.EvalSource — an
  // eager val here turns object init into a cycle and whichever side
  // initializes second reads null (the nearDupSafeSplitOracle /
  // bpePackSequencesOracle precedent; surfaced when a Map-order change
  // flipped which object <clinit>s first)
  lazy val curationFunnelOracle: String =
    s"""WITH canon AS (${DedupModels.dedupExactOracle}),
       |rep AS ($repetitionSignalsOracle),
       |cont AS ($decontaminationOracle),
       |semc AS (${SimilarityModels.semanticDecontaminationOracle}),
       |samp AS ($stratifiedSampleOracle),
       |docs AS (SELECT doc_id, lang, source, md5($normSqlDuck) AS fp
       |         FROM documents),
       |j AS (SELECT d.doc_id, d.lang, d.source,
       |             d.doc_id <> c.canonical_doc_id AS is_duplicate,
       |             coalesce(r.flagged, false) AS rep_flagged,
       |             coalesce(n.flagged, false) AS contaminated,
       |             m.doc_id IS NOT NULL AS sem_contaminated,
       |             s.kept AS sample_kept
       |      FROM docs d
       |      JOIN canon c ON d.fp = c.fingerprint
       |      LEFT JOIN rep r ON d.doc_id = r.doc_id
       |      LEFT JOIN cont n ON d.doc_id = n.doc_id
       |      LEFT JOIN semc m ON d.doc_id = m.doc_id
       |      JOIN samp s ON d.doc_id = s.doc_id)
       |SELECT doc_id, lang, source, is_duplicate, rep_flagged,
       |       contaminated, sem_contaminated, sample_kept,
       |       CASE WHEN source = '$EvalSource' THEN 'eval'
       |            WHEN is_duplicate THEN 'duplicate'
       |            WHEN rep_flagged THEN 'repetitive'
       |            WHEN contaminated THEN 'contaminated'
       |            WHEN sem_contaminated THEN 'sem_contaminated'
       |            WHEN NOT sample_kept THEN 'sampled_out'
       |            ELSE 'kept' END AS verdict
       |FROM j""".stripMargin

  /** c08: packing-efficiency accounting — the budget sheet a training
    * build reads after c05 packs its streams: per language, how many
    * fixed `PackBudget`-token windows the packed streams occupy, how
    * full they are (fill ratio in exact integer micros — the padding
    * waste is `1 − fill`), and how many documents straddle window
    * boundaries (each crossing is a packer split or a cross-document
    * attention contamination, the trade sequence packing manages).
    * Windows per (lang, shard) stream = `max(last_seq) + 1` (offsets
    * restart per stream); only the stream's LAST window can be
    * partial, so fill approaches 1 as streams lengthen — the property
    * that makes shard-bounded packing cheap at 100 TB.
    *
    * Scale: reads c05's output grain (doc rows), one (lang, shard)
    * rollup with map-side combine, then a |langs|-row re-rollup.
    */
  def packingEfficiency(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    packSequences(spark, sfDir)
      .groupBy($"lang", $"shard")
      .agg(count(lit(1)).as("docs"),
        sum($"n_tokens").as("tokens"),
        (max($"last_seq") + 1L).as("windows"),
        sum($"last_seq" - $"first_seq").as("crossings"),
        sum(when($"boundary_split", 1L).otherwise(0L)).as("split_docs"))
      .groupBy($"lang")
      .agg(sum($"docs").as("doc_count"),
        sum($"tokens").as("total_tokens"),
        sum($"windows").as("windows"),
        sum($"crossings").as("boundary_crossings"),
        sum($"split_docs").as("split_docs"))
      .withColumn("capacity", $"windows" * lit(PackBudget))
      .withColumn("fill_micros",
        expr("(total_tokens * 1000000) div capacity"))
  }

  val packingEfficiencyOracle: String =
    s"""WITH packed AS ($packSequencesOracle),
       |per_stream AS (
       |  SELECT lang, shard, count(*) AS docs, sum(n_tokens) AS tokens,
       |         max(last_seq) + 1 AS windows,
       |         sum(last_seq - first_seq) AS crossings,
       |         sum(CASE WHEN boundary_split THEN 1 ELSE 0 END) AS split_docs
       |  FROM packed GROUP BY 1, 2),
       |per_lang AS (
       |  SELECT lang, sum(docs) AS doc_count, sum(tokens) AS total_tokens,
       |         sum(windows) AS windows, sum(crossings) AS boundary_crossings,
       |         sum(split_docs) AS split_docs
       |  FROM per_stream GROUP BY 1)
       |SELECT lang, cast(doc_count AS BIGINT) AS doc_count,
       |       cast(total_tokens AS BIGINT) AS total_tokens,
       |       cast(windows AS BIGINT) AS windows,
       |       cast(boundary_crossings AS BIGINT) AS boundary_crossings,
       |       cast(split_docs AS BIGINT) AS split_docs,
       |       cast(windows * $PackBudget AS BIGINT) AS capacity,
       |       cast((total_tokens * 1000000) // (windows * $PackBudget) AS BIGINT)
       |         AS fill_micros
       |FROM per_lang""".stripMargin

  /** c09 split thresholds over the 256 content-hash buckets:
    * bucket < 244 → train (~95.3%), < 250 → val (~2.3%), else test. */
  private val TrainPer256 = 244
  private val ValPer256 = 250

  /** c09: LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT (beyond-reference) — the
    * split assignment is a deterministic hash of the document's CONTENT
    * fingerprint (d01's normalized-text md5), not of its id: byte-equal
    * duplicates always share a bucket, so an exact duplicate of a
    * training document can never leak into val/test no matter how many
    * ids it ships under — the train-on-test contamination mode id-keyed
    * splits are blind to. (Near-dup-safe splitting composes d03/d07's
    * cluster labels with the same idiom; this operator is the exact
    * tier.) Buckets come from the first two hex digits of md5(fp) — the
    * c02 idiom, re-hashed so sampling (keyed on doc_id) and splitting
    * (keyed on content) stay independent coins.
    *
    * Output is the per (split, lang) audit: doc counts, distinct
    * fingerprints, and the duplicate mass that traveled together
    * (`n_dup_docs` = docs − unique fps — every one of these would have
    * been a potential leak under an id-keyed split).
    *
    * Scale: a stateless per-doc map (no RNG, no order dependence —
    * reshuffling or re-sharding the corpus cannot move a document
    * across splits) + one output-sized rollup; the shuffle is the
    * (split, lang) aggregate with map-side combine. countDistinct(fp)
    * shuffles (split, lang, fp) partials — fp-keyed, uniform, no skew.
    */
  def leakageSafeSplit(spark: SparkSession, sfDir: String): DataFrame =
    leakageSafeSplitFrom(Tables.documents(spark, sfDir))

  /** Per-document split labels (doc_id, lang, n_chars, fp, split) — the
    * doc-grain surface c09's rollup aggregates and the curation
    * pipeline materializes as `curation_splits`. A stateless map: a
    * doc's label depends only on its own content, so labels appended
    * for new docs are identical to what a full rebuild would assign
    * (CurationPipelineSpec pins table equality). */
  def splitLabelsFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(IntegerType)
    docs
      .select($"doc_id", $"lang", $"n_chars",
        md5(normText($"text")).as("fp"))
      .withColumn("h", md5($"fp"))
      .withColumn("bucket",
        hexVal(substring($"h", 1, 1)) * 16 + hexVal(substring($"h", 2, 1)))
      .withColumn("split",
        when($"bucket" < TrainPer256, "train")
          .when($"bucket" < ValPer256, "val")
          .otherwise("test"))
      .select($"doc_id", $"lang", $"n_chars", $"fp", $"split")
  }

  /** Frame-parameterized variant (incremental runs feed only NEW docs;
    * their split labels are stable because the hash ignores run state).
    * doc_id is pruned out of the scan by Catalyst (the rollup never
    * uses it — PlanAuditSpec's c09 canary holds). */
  def leakageSafeSplitFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    splitLabelsFrom(docs)
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_unique_fp"),
        sum($"n_chars").as("total_chars"))
      .withColumn("n_dup_docs", $"n_docs" - $"n_unique_fp")
  }

  val leakageSafeSplitOracle: String =
    s"""WITH d AS (SELECT lang, n_chars, md5($normSqlDuck) AS fp
       |           FROM documents),
       |b AS (SELECT lang, n_chars, fp,
       |             (strpos('0123456789abcdef', substr(md5(fp),1,1)) - 1) * 16 +
       |             (strpos('0123456789abcdef', substr(md5(fp),2,1)) - 1) AS bucket
       |      FROM d),
       |s AS (SELECT lang, n_chars, fp,
       |             CASE WHEN bucket < $TrainPer256 THEN 'train'
       |                  WHEN bucket < $ValPer256 THEN 'val'
       |                  ELSE 'test' END AS split
       |      FROM b)
       |SELECT split, lang, count(*) AS n_docs,
       |       count(DISTINCT fp) AS n_unique_fp,
       |       cast(sum(n_chars) AS BIGINT) AS total_chars,
       |       count(*) - count(DISTINCT fp) AS n_dup_docs
       |FROM s GROUP BY 1, 2""".stripMargin

  /** c12: TRAIN-SPLIT-ONLY PACKING (beyond-reference) — the downstream
    * SAMPLER of the split labels: what actually feeds a training run
    * packs ONLY train-labeled documents, so val/test text can never
    * enter the packed stream by construction (the composition that
    * makes c09's labels load-bearing rather than descriptive — the
    * pipeline materializes the same stage as `train_split_packing`).
    * Offsets are positions in the TRAIN stream: dropping val/test docs
    * re-bases every downstream offset, which is why the sampler is a
    * distinct materialization and not a filter over c05's.
    *
    * Scale: the split label is a stateless content hash evaluated
    * inside the same scan (no label-table shuffle at all in the query
    * form; the pipeline form semi-joins the materialized labels), and
    * packing keeps c05's shard-bounded window geometry.
    */
  def trainSplitPacking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    // split labels key on the ORIGINAL text's content hash (stable no
    // matter what the trimmer later removes); the packed stream itself
    // reads the span-trimmed corpus — trim is corpus-global (dups
    // across split boundaries still trim), selection is train-only
    val train = splitLabelsFrom(docs).filter($"split" === "train")
      .select($"doc_id")
    packSequencesFrom(
      trimmedDocs(spark, sfDir).join(train, Seq("doc_id"), "left_semi"))
  }

  val trainSplitPackingOracle: String =
    s"""WITH ${DedupModels.spanTrimSqlCtes},
       |lbl AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id,
       |           (strpos('0123456789abcdef', substr(md5(fp),1,1)) - 1) * 16 +
       |           (strpos('0123456789abcdef', substr(md5(fp),2,1)) - 1) AS bucket
       |    FROM (SELECT doc_id, md5($normSqlDuck) AS fp FROM documents))
       |  WHERE bucket < $TrainPer256),
       |d AS (SELECT doc_id, lang, doc_id // $PackShard AS shard,
       |             len(string_split(text, ' ')) AS n_tokens
       |      FROM trimmed
       |      WHERE doc_id IN (SELECT doc_id FROM lbl)),
       |o AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard
       |           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |           AND CURRENT ROW) AS end_offset
       |      FROM d)
       |SELECT doc_id, lang, cast(shard AS BIGINT) AS shard,
       |       cast(n_tokens AS BIGINT) AS n_tokens,
       |       cast(end_offset - n_tokens AS BIGINT) AS start_offset,
       |       cast((end_offset - n_tokens) // $PackBudget AS BIGINT)
       |         AS first_seq,
       |       cast((end_offset - 1) // $PackBudget AS BIGINT) AS last_seq,
       |       (end_offset - 1) // $PackBudget >
       |       (end_offset - n_tokens) // $PackBudget AS boundary_split
       |FROM o""".stripMargin

  /** c13: BPE-BUDGET PACKING (beyond-reference) — packing under the
    * TRAINED TOKENIZER's budget, the composition every production
    * pretraining build actually runs: c05 counts whitespace words, but
    * a training sequence's capacity is measured in the tokenizer's
    * tokens, so the packer that feeds a GPU packs by the t12-trained
    * BPE segmentation's per-doc token count. Three trained/materialized
    * artifacts compose here without new machinery: t12's merge table
    * (vocabulary-sized, broadcast), d11's span-trimmed corpus (what
    * c05/c12 also pack), and c05's shard-bounded offset geometry.
    *
    * A document's token count is the sum of its words' segment counts
    * under the trained merges — the exact number t13's accounting
    * aggregates per language, here kept at doc grain and fed to the
    * packer. Documents whose trimmed text is empty pack as zero-token
    * rows (their interval is a point; `greatest` clamps `last_seq` so
    * the point lands in its own sequence on both engines — Spark `div`
    * truncates toward zero while DuckDB `//` floors, and
    * `end_offset − 1` is the one place a −1 could appear).
    *
    * Scale: one trimmed-corpus scan + a broadcast join against the
    * vocabulary dim + a doc-grain rollup, then c05's per-(lang, shard)
    * bounded running sum — applying a tokenizer budget at 100 TB adds
    * NO shuffle beyond the rollup to the packing plan.
    */
  def bpePackSequences(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seg = TextModels.bpeSegmentation(spark, sfDir)
    import org.apache.spark.sql.expressions.Window
    val counts = trimmedDocs(spark, sfDir)
      .select($"doc_id", $"lang", explode(TextModels.toks($"text")).as("w"))
      .join(broadcast(seg), Seq("w"), "left")
      .groupBy($"doc_id", $"lang")
      .agg(coalesce(sum($"n_syms"), lit(0L)).as("n_tokens"))
    val w = Window.partitionBy($"lang", $"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    counts
      .withColumn("shard", expr(s"doc_id div $PackShard"))
      .withColumn("end_offset", sum($"n_tokens").over(w))
      .withColumn("start_offset", $"end_offset" - $"n_tokens")
      .withColumn("first_seq", expr(s"start_offset div $PackBudget"))
      .withColumn("last_seq",
        greatest($"first_seq", expr(s"(end_offset - 1) div $PackBudget")))
      .select($"doc_id", $"lang", $"shard", $"n_tokens", $"start_offset",
        $"first_seq", $"last_seq",
        ($"last_seq" > $"first_seq").as("boundary_split"))
  }

  /** lazy: TextModels ↔ CurationModels initialize mutually (its
    * nbQualityScore/dsir oracles read [[EvalSource]]); an eager val
    * here would call `bpeOracleCtes` while TextModels' own `<clinit>`
    * is still in flight and read `BpeRounds` as 0 — the merge-round
    * CTEs would silently vanish from the oracle (the
    * nearDupSafeSplitOracle precedent). */
  lazy val bpePackSequencesOracle: String =
    "WITH " + TextModels.bpeOracleCtes + DedupModels.spanTrimSqlCtes +
      s""",
         |bseg AS (SELECT w,
         |                cast(len(string_split(trim(s), ' ')) AS BIGINT)
         |                  AS n_syms
         |         FROM w${TextModels.BpeRounds}),
         |bcnt AS (SELECT t.doc_id, t.lang,
         |                coalesce(sum(g.n_syms), 0) AS n_tokens
         |         FROM (SELECT doc_id, lang,
         |                      unnest(string_split(text, ' ')) AS w
         |               FROM trimmed) t
         |         LEFT JOIN bseg g ON t.w = g.w
         |         GROUP BY 1, 2),
         |bd AS (SELECT doc_id, lang, doc_id // $PackShard AS shard,
         |              n_tokens
         |       FROM bcnt),
         |bo AS (SELECT *, sum(n_tokens) OVER (PARTITION BY lang, shard
         |            ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
         |            AND CURRENT ROW) AS end_offset
         |       FROM bd)
         |SELECT doc_id, lang, cast(shard AS BIGINT) AS shard,
         |       cast(n_tokens AS BIGINT) AS n_tokens,
         |       cast(end_offset - n_tokens AS BIGINT) AS start_offset,
         |       cast((end_offset - n_tokens) // $PackBudget AS BIGINT)
         |         AS first_seq,
         |       cast(greatest((end_offset - n_tokens) // $PackBudget,
         |                     (end_offset - 1) // $PackBudget) AS BIGINT)
         |         AS last_seq,
         |       greatest((end_offset - n_tokens) // $PackBudget,
         |                (end_offset - 1) // $PackBudget) >
         |       (end_offset - n_tokens) // $PackBudget AS boundary_split
         |FROM bo""".stripMargin

  /** c10: NEAR-DUP-SAFE SPLIT (beyond-reference) — c09 closed the
    * byte-equal leak; this closes the REPHRASING leak: the split is
    * keyed on the near-dup CLUSTER's representative content (d07's
    * connected components over LSH-verified Jaccard pairs), so a
    * lightly-edited copy of a training document — different
    * fingerprint, same cluster — can never land in val/test either.
    * This is the fuzzy-dedup-aware split a serious eval protocol runs
    * (near-dup train/test contamination inflates benchmark scores
    * exactly like exact duplicates do, and id- or fp-keyed splits are
    * both blind to it).
    *
    * Group key: the cluster representative's fingerprint (min-doc_id
    * member, resolved with ONE per-cluster window over the rep-keyed
    * partition — no second corpus scan); singletons key on their own
    * fingerprint, so c10 degrades to exactly c09 on a pair-free corpus.
    * Same 244/6/6 md5 buckets as c09.
    *
    * Output: per (split, lang) — docs, distinct groups, docs that
    * arrived via a near-dup cluster, chars.
    *
    * Scale: d07's component labels are edge-bounded (near-dup docs
    * only); the label join is doc-keyed; the rep-fp window shuffles on
    * rep_id (cluster-sized partitions — near-dup clusters are small
    * dense sets); the rollup is output-sized. Nothing all-pairs beyond
    * d03's banded candidate generation.
    */
  def nearDupSafeSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars",
        md5(normText($"text")).as("fp"))
    val comp = DedupModels.nearDupClusters(spark, sfDir)
      .select($"doc_id", $"component_id")
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(IntegerType)
    val withRep = docs.join(comp, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce($"component_id", $"doc_id"))
    // the representative is a member of its own cluster, so its fp is
    // IN the rep_id partition — one window, no second corpus scan
    val wRep = Window.partitionBy($"rep_id")
    withRep
      .withColumn("group_fp",
        first(when($"doc_id" === $"rep_id", $"fp"), ignoreNulls = true)
          .over(wRep))
      .withColumn("h", md5($"group_fp"))
      .withColumn("bucket",
        hexVal(substring($"h", 1, 1)) * 16 + hexVal(substring($"h", 2, 1)))
      .withColumn("split",
        when($"bucket" < TrainPer256, "train")
          .when($"bucket" < ValPer256, "val")
          .otherwise("test"))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"group_fp").as("n_groups"),
        sum(when($"component_id".isNotNull, 1L).otherwise(0L))
          .as("n_clustered_docs"),
        sum($"n_chars").as("total_chars"))
  }

  lazy val nearDupSafeSplitOracle: String =
    s"""WITH comp AS (SELECT * FROM (${DedupModels.nearDupClustersOracle}) t),
       |d AS (SELECT doc_id, lang, n_chars, md5($normSqlDuck) AS fp
       |      FROM documents),
       |j AS (SELECT d.*, c.component_id,
       |             coalesce(c.component_id, d.doc_id) AS rep_id
       |      FROM d LEFT JOIN comp c ON d.doc_id = c.doc_id),
       |reps AS (SELECT rep_id, fp AS group_fp FROM j WHERE doc_id = rep_id),
       |k AS (SELECT j.*, r.group_fp
       |      FROM j JOIN reps r ON j.rep_id = r.rep_id),
       |b AS (SELECT k.*,
       |             (strpos('0123456789abcdef', substr(md5(group_fp),1,1)) - 1) * 16 +
       |             (strpos('0123456789abcdef', substr(md5(group_fp),2,1)) - 1) AS bucket
       |      FROM k),
       |s AS (SELECT b.*,
       |             CASE WHEN bucket < $TrainPer256 THEN 'train'
       |                  WHEN bucket < $ValPer256 THEN 'val'
       |                  ELSE 'test' END AS split
       |      FROM b)
       |SELECT split, lang, count(*) AS n_docs,
       |       count(DISTINCT group_fp) AS n_groups,
       |       count(component_id) AS n_clustered_docs,
       |       cast(sum(n_chars) AS BIGINT) AS total_chars
       |FROM s GROUP BY 1, 2""".stripMargin

  /** Default shard count of the c15 epoch shuffle — DEMO geometry (the
    * driver query's fixed value). Production passes its own count to
    * [[epochShuffleAt]] — corpus_docs / docs-per-shard-file, so each
    * shard is one bounded output file; the plan is shard-count-agnostic
    * (everything is keyed BY shard, nothing enumerates shards). */
  private[graft] val EpochShards = 8L

  /** c15: EPOCH SHUFFLE — the deterministic GLOBAL training-order
    * permutation every pretraining run applies between the curated
    * corpus and the dataloader: docs are ordered by an md5-derived
    * permutation key (the c02/c07 coin idiom — no RNG, bit-identical
    * replay on both engines and across re-runs, which is what makes a
    * training run reproducible), bucketed into [[EpochShards]] shard
    * files, and given their within-shard position. c05's packer orders
    * by doc_id WITHIN streams (offset bookkeeping); c15 is the step
    * that makes the stream ORDER random with respect to crawl/source
    * order, so a sequential reader sees an i.i.d.-like mix. Reads the
    * span-trimmed corpus — the shuffle covers what actually ships.
    *
    * Scale: the permutation key is uniform by construction (md5 of the
    * UNIQUE doc_id — no hot keys possible, unlike content hashes), so
    * shards are balanced to ±√ noise. The per-shard row_number window
    * is one sort per shard partition, and a shard partition IS the
    * unit a shard-file writer must stream through one task anyway —
    * the window adds no serialization the write path doesn't already
    * have. Shard count grows with the corpus (constant file size), so
    * per-task volume stays bounded at 100 TB.
    */
  def epochShuffle(spark: SparkSession, sfDir: String): DataFrame =
    epochShuffleAt(spark, sfDir, epoch = 0L)

  /** Epoch-parameterized form: the permutation key salts the doc id
    * with the epoch number (`md5("<epoch>:<doc_id>")`), so every epoch
    * reads the corpus in a DIFFERENT deterministic order — the actual
    * point of between-epoch reshuffling — while any given epoch
    * replays bit-identically (MixShuffleRepSpec pins both). The driver
    * query (c15) is epoch 0 at the demo [[EpochShards]]; production
    * geometry (docs-per-shard-file) is the `shards` argument — no
    * recompile needed. */
  def epochShuffleAt(spark: SparkSession, sfDir: String,
      epoch: Long, shards: Long = EpochShards): DataFrame =
    epochShuffleFrom(trimmedDocs(spark, sfDir), epoch, shards)

  /** The c15 permutation key for one epoch — md5 of the epoch-salted
    * UNIQUE doc id (no hot keys, bit-identical replay). */
  private[graft] def epochPermCol(epoch: Long, docId: Column): Column =
    md5(concat(lit(epoch.toString), lit(":"), docId.cast(StringType)))

  /** A doc's shard under the c15 permutation: the perm key's first four
    * hex digits mod the shard count. SHARED by [[epochShuffleFrom]] and
    * the erasure purge's touched-shard scoping
    * (`CurationPipeline.deleteDocs`) — the scoping is only sound
    * because it computes membership with the writer's own function, so
    * the two can never disagree on which shard holds a doc. Corpus-
    * independent by construction (pure hash of the id), which is what
    * makes "which shards did these docs live in" answerable without a
    * corpus pass. */
  private[graft] def epochShardCol(epoch: Long, docId: Column,
      shards: Long): Column = {
    val perm = epochPermCol(epoch, docId)
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(LongType)
    (hexVal(substring(perm, 1, 1)) * 4096 +
      hexVal(substring(perm, 2, 1)) * 256 +
      hexVal(substring(perm, 3, 1)) * 16 +
      hexVal(substring(perm, 4, 1))) % shards
  }

  /** The projection half of [[epochShuffleFrom]] — `(doc_id, n_tokens)`
    * without the per-shard window. This is the WHOLE document state an
    * epoch shard row can depend on: shard membership and shard_pos are
    * pure functions of (epoch, doc_id), offsets/sequences of the
    * shard's (doc_id, n_tokens) multiset in permutation order, and the
    * payload text is recoverable from n_tokens equality because a
    * span-trim change ALWAYS changes the token count (a removal drops
    * ≥1 token, a restore adds it back) while raw text and lang are
    * immutable — which is what lets the erasure purge diff an epoch
    * against its own files on these two columns alone. */
  private[graft] def epochDocState(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select($"doc_id",
      size(tokens($"text")).cast(LongType).as("n_tokens"))
  }

  /** Frame-parameterized core of c15 — also the shard-file writer's
    * entry ([[graft.runner.CurationPipeline]] feeds it the materialized
    * trimmed corpus rather than re-deriving the trim). */
  def epochShuffleFrom(docs: DataFrame, epoch: Long,
      shards: Long = EpochShards): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    require(shards > 0, s"shard count must be positive, got $shards")
    epochDocState(docs)
      .withColumn("perm", epochPermCol(epoch, $"doc_id"))
      .withColumn("shard", epochShardCol(epoch, $"doc_id", shards))
      .withColumn("shard_pos", row_number().over(
        Window.partitionBy($"shard").orderBy($"perm", $"doc_id"))
        .cast(LongType))
      .select($"doc_id", $"shard", $"shard_pos", $"n_tokens", $"perm")
  }

  /** FIM application rate as a 16-bit threshold: coin < 32768 ⇔ 50%. */
  private[graft] val FimRate16 = 32768L

  /** c16: FILL-IN-MIDDLE TRANSFORM (beyond-reference) — the data-level
    * augmentation code-model pretraining applies (Bavarian et al. 2022,
    * arXiv:2207.14255): for a deterministic ~50% of documents, cut the
    * token stream at two points and re-emit in PSM order
    * (`<fim_prefix> P <fim_suffix> S <fim_middle> M`) so the model
    * learns infilling at no pretrain-corpus cost. The coin AND both
    * cut points derive from the doc's own md5 (the c02/c07 idiom —
    * no RNG, bit-identical replay on both engines and across re-runs,
    * so the transformed corpus is reproducible): hex 1–4 is the
    * apply coin, hex 5–8 and 9–12 the two cuts in [1, n−1] (prefix
    * and suffix never empty; middle may be). Docs under 4 tokens pass
    * through untransformed.
    *
    * Output per doc: the segment geometry and the md5 of the emitted
    * token stream (transformed or passthrough) — the witness both
    * engines hash-compare without shipping the text.
    *
    * Scale: a stateless per-row map over one corpus scan — no shuffle,
    * no state, trivially 100 TB-safe; it composes BEFORE c05/c13
    * packing exactly where FIM sits in a production pipeline.
    */
  def fimTransform(spark: SparkSession, sfDir: String): DataFrame =
    fimTransformFrom(Tables.documents(spark, sfDir))

  /** Frame-parameterized core of c16 — a PURE stateless projection, so
    * the streaming twin ([[graft.streaming.StreamingFim]]) runs this
    * EXACT function over `readStream` and is row-identical to batch by
    * construction. */
  def fimTransformFrom(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(LongType)
    def h16(h: Column, off: Int): Column =
      hexVal(substring(h, off, 1)) * 4096 +
        hexVal(substring(h, off + 1, 1)) * 256 +
        hexVal(substring(h, off + 2, 1)) * 16 +
        hexVal(substring(h, off + 3, 1))
    val cut = docs
      .select($"doc_id", tokens($"text").as("toks"))
      .withColumn("n_tokens", size($"toks").cast(LongType))
      .withColumn("h", md5($"doc_id".cast(StringType)))
      .withColumn("fim_applied",
        $"n_tokens" >= 4 && h16($"h", 1) < FimRate16)
      // guard: den ≥ 1 keeps the modulo total (ANSI mode) for the
      // short docs the filter already excludes
      .withColumn("den", greatest($"n_tokens" - 1, lit(1L)))
      .withColumn("ca", lit(1L) + h16($"h", 5) % $"den")
      .withColumn("cb", lit(1L) + h16($"h", 9) % $"den")
      .withColumn("p1", least($"ca", $"cb"))
      .withColumn("p2", greatest($"ca", $"cb"))
    val psm = concat(
      array(lit("<fim_prefix>")), slice($"toks", lit(1), $"p1".cast("int")),
      array(lit("<fim_suffix>")),
      slice($"toks", ($"p2" + 1).cast("int"), ($"n_tokens" - $"p2").cast("int")),
      array(lit("<fim_middle>")),
      slice($"toks", ($"p1" + 1).cast("int"), ($"p2" - $"p1").cast("int")))
    cut
      .withColumn("out_text",
        when($"fim_applied", concat_ws(" ", psm))
          .otherwise(concat_ws(" ", $"toks")))
      .select($"doc_id", $"n_tokens", $"fim_applied",
        when($"fim_applied", $"p1").as("n_prefix"),
        when($"fim_applied", $"p2" - $"p1").as("n_middle"),
        when($"fim_applied", $"n_tokens" - $"p2").as("n_suffix"),
        md5($"out_text").as("out_hash"))
  }

  val fimTransformOracle: String = {
    def hexAt(i: Int): String =
      s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
    def h16(off: Int): String =
      s"(${hexAt(off)} * 4096 + ${hexAt(off + 1)} * 256 + " +
        s"${hexAt(off + 2)} * 16 + ${hexAt(off + 3)})"
    s"""WITH d AS (SELECT doc_id, string_split(${DedupModels.normSqlDuck}, ' ') AS toks
       |           FROM documents),
       |b AS (SELECT doc_id, toks, cast(len(toks) AS BIGINT) AS n_tokens,
       |             md5(cast(doc_id AS VARCHAR)) AS h
       |      FROM d),
       |c AS (SELECT *, n_tokens >= 4 AND ${h16(1)} < $FimRate16 AS fim_applied,
       |             greatest(n_tokens - 1, 1) AS den
       |      FROM b),
       |e AS (SELECT *, 1 + ${h16(5)} % den AS ca, 1 + ${h16(9)} % den AS cb
       |      FROM c),
       |f AS (SELECT *, least(ca, cb) AS p1, greatest(ca, cb) AS p2 FROM e),
       |g AS (SELECT doc_id, n_tokens, fim_applied,
       |             CASE WHEN fim_applied THEN p1 END AS n_prefix,
       |             CASE WHEN fim_applied THEN p2 - p1 END AS n_middle,
       |             CASE WHEN fim_applied THEN n_tokens - p2 END AS n_suffix,
       |             CASE WHEN fim_applied THEN
       |               array_to_string(list_concat(list_concat(list_concat(
       |                 list_concat(list_concat(
       |                 ['<fim_prefix>'], toks[1:p1]), ['<fim_suffix>']),
       |                 toks[p2+1:n_tokens]), ['<fim_middle>']),
       |                 toks[p1+1:p2]), ' ')
       |             ELSE array_to_string(toks, ' ') END AS out_text
       |      FROM f)
       |SELECT doc_id, n_tokens, fim_applied,
       |       cast(n_prefix AS BIGINT) AS n_prefix,
       |       cast(n_middle AS BIGINT) AS n_middle,
       |       cast(n_suffix AS BIGINT) AS n_suffix,
       |       md5(out_text) AS out_hash
       |FROM g""".stripMargin
  }

  /** Per-doc packed rows over an epoch-ordered frame (the
    * [[epochShuffleFrom]] output): running token offsets and
    * [[PackBudget]]-window membership in shard_pos order — the numbers
    * a sequential reader of an epoch shard file sees. Shared by the
    * c17 manifest query and the pipeline's shard-file writer
    * (`CurationPipeline.writeEpochShards`), so the files and the
    * manifest can never disagree on geometry. */
  private[graft] def epochPackedFrom(ordered: DataFrame): DataFrame = {
    import ordered.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shard").orderBy($"shard_pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ordered
      .withColumn("end_offset", sum($"n_tokens").over(w))
      .withColumn("start_offset", $"end_offset" - $"n_tokens")
      .withColumn("first_seq", expr(s"start_offset div $PackBudget"))
      .withColumn("last_seq", expr(s"(end_offset - 1) div $PackBudget"))
      .select($"shard", $"shard_pos", $"doc_id", $"n_tokens",
        $"start_offset", $"first_seq", $"last_seq",
        ($"last_seq" > $"first_seq").as("boundary_split"))
  }

  /** The per-shard dataloader manifest rollup of [[epochPackedFrom]]:
    * docs, tokens, packed sequence windows, boundary crossings. */
  private[graft] def epochManifestFrom(packed: DataFrame): DataFrame = {
    import packed.sparkSession.implicits._
    packed.groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("n_tokens"),
        (max($"last_seq") + 1L).as("n_seqs"),
        sum(when($"boundary_split", 1L).otherwise(0L))
          .as("boundary_splits"))
      .select($"shard", $"n_docs", $"n_tokens", $"n_seqs",
        $"boundary_splits")
  }

  /** Resume-cursor interval: one restartable checkpoint per this many
    * packed sequences. Demo-sized like [[EpochShards]]; production
    * passes its own interval to the writer. */
  private[graft] val EpochCursorSeqs = 4L

  /** MID-SHARD RESUME CURSORS over an [[epochPackedFrom]]-shaped frame
    * (the round-13 "missing #5"): per shard, a sorted array of
    * `(seq, row, skip_tokens)` checkpoints at every `everySeqs`-th
    * [[PackBudget]]-token sequence boundary. `row` IS the owning doc's
    * 1-BASED `shard_pos` — the same value stored on the shard rows
    * themselves, so a reader matches `shard_pos >= row` (equivalently:
    * 0-based physical file index `row - 1`, since rows are stored in
    * shard_pos order starting at 1). A dataloader that died mid-shard
    * seeks to the greatest cursor ≤ its last-committed sequence, reads
    * the shard file from that row, discards the first `skip_tokens`
    * tokens of it, and then streams EXACTLY the token suffix a full
    * read would deliver from that sequence boundary
    * (EpochShardWriterSpec pins the equality) — instead of re-reading
    * from the file head.
    *
    * A checkpoint at sequence `s` (token offset `s·PackBudget`) belongs
    * to the UNIQUE non-empty doc whose `[start_offset, end_offset)`
    * half-open token range contains that offset — docs own disjoint
    * ranges, so each doc emits the checkpoints landing inside its own
    * range (a per-row `sequence()` over its cp window; zero-token docs
    * own no tokens and emit none). One projection + the existing
    * per-shard rollup — no extra pass over the corpus. */
  private[graft] def epochCursorsFrom(packed: DataFrame,
      everySeqs: Long = EpochCursorSeqs): DataFrame = {
    import packed.sparkSession.implicits._
    require(everySeqs > 0, s"cursor interval must be positive: $everySeqs")
    val kb = everySeqs * PackBudget // tokens between checkpoints
    packed
      .withColumn("end_offset", $"start_offset" + $"n_tokens")
      .withColumn("first_cp", expr(s"(start_offset + $kb - 1) div $kb"))
      .withColumn("last_cp", expr(s"(end_offset - 1) div $kb"))
      .filter($"n_tokens" > 0 && $"last_cp" >= $"first_cp")
      .select($"shard", explode(sequence($"first_cp", $"last_cp")).as("cp"),
        $"shard_pos", $"start_offset")
      .select($"shard",
        struct(($"cp" * everySeqs).as("seq"), $"shard_pos".as("row"),
          ($"cp" * kb - $"start_offset").as("skip_tokens")).as("cursor"))
      .groupBy($"shard")
      .agg(sort_array(collect_list($"cursor")).as("cursors"))
  }

  /** [[epochManifestFrom]] plus the per-shard resume-cursor array — the
    * persisted-manifest builder (`CurationPipeline` publishes this over
    * the written shard files; the c17 query keeps the cursor-free
    * rollup its oracle states). A shard can legitimately have no
    * cursors (fewer than `everySeqs` sequences) → empty array. */
  private[graft] def epochManifestWithCursorsFrom(packed: DataFrame,
      everySeqs: Long = EpochCursorSeqs): DataFrame = {
    import packed.sparkSession.implicits._
    epochManifestFrom(packed)
      .join(epochCursorsFrom(packed, everySeqs), Seq("shard"), "left")
      .withColumn("cursors", coalesce($"cursors", array()))
  }

  /** c17: EPOCH-SHARD MANIFEST (beyond-reference) — the dataloader's
    * accounting row per epoch-0 shard at the demo geometry: how many
    * docs and tokens a sequential reader of each shard file streams,
    * how many fixed [[PackBudget]]-token training sequences that
    * packs into, and how many docs straddle window boundaries. This is
    * the c15 permutation composed with c05's packing geometry — the
    * same composition `CurationPipeline.writeEpochShards` materializes
    * as per-shard ordered files (EpochShardWriterSpec pins file
    * content ≡ this math); the query form puts the composition under
    * the DuckDB hash gate.
    *
    * Scale: the permutation is a stateless map; the running-offset
    * window is one sort per shard partition (the shard-file writer's
    * single task); the manifest is a map-side-combined |shards|-row
    * rollup.
    */
  def epochShardManifest(spark: SparkSession, sfDir: String): DataFrame =
    epochManifestFrom(epochPackedFrom(
      epochShuffleFrom(trimmedDocs(spark, sfDir), epoch = 0L)))

  val epochShardManifestOracle: String = {
    def hexAt(i: Int): String =
      s"(strpos('0123456789abcdef', substr(perm, $i, 1)) - 1)"
    s"""WITH ${DedupModels.spanTrimSqlCtes},
       |d AS (SELECT doc_id,
       |             cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |             md5('0:' || cast(doc_id AS VARCHAR)) AS perm
       |      FROM trimmed),
       |s AS (SELECT *,
       |             (${hexAt(1)} * 4096 + ${hexAt(2)} * 256 +
       |              ${hexAt(3)} * 16 + ${hexAt(4)}) % $EpochShards AS shard
       |      FROM d),
       |p AS (SELECT shard, n_tokens,
       |             row_number() OVER (PARTITION BY shard
       |               ORDER BY perm, doc_id) AS shard_pos
       |      FROM s),
       |o AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard
       |               ORDER BY shard_pos ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW) AS end_offset
       |      FROM p),
       |q AS (SELECT shard, n_tokens,
       |             (end_offset - n_tokens) // $PackBudget AS first_seq,
       |             (end_offset - 1) // $PackBudget AS last_seq
       |      FROM o)
       |SELECT cast(shard AS BIGINT) AS shard,
       |       count(*) AS n_docs,
       |       cast(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       cast(max(last_seq) + 1 AS BIGINT) AS n_seqs,
       |       cast(sum(CASE WHEN last_seq > first_seq THEN 1 ELSE 0 END)
       |         AS BIGINT) AS boundary_splits
       |FROM q GROUP BY 1""".stripMargin
  }

  /** c18: EPOCH RESUME CURSORS (beyond-reference, r14) — the
    * [[epochCursorsFrom]] checkpoint math flattened to rows so the
    * DuckDB oracle hash-gates it: for epoch 0 at the demo geometry,
    * every `(shard, seq, row_pos, skip_tokens)` restart point a
    * dataloader can seek to (see [[epochCursorsFrom]] for the seek
    * contract; EpochShardWriterSpec pins suffix equality against the
    * written files — this query pins the ARITHMETIC against an
    * independent engine). Same scale shape as c17: stateless
    * permutation, per-shard running-offset window, one in-row
    * `sequence()` per doc. */
  def epochResumeCursors(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    epochCursorsFrom(epochPackedFrom(
      epochShuffleFrom(trimmedDocs(spark, sfDir), epoch = 0L)))
      .select($"shard", explode($"cursors").as("c"))
      .select($"shard", $"c.seq".as("seq"), $"c.row".as("row_pos"),
        $"c.skip_tokens".as("skip_tokens"))
  }

  val epochResumeCursorsOracle: String = {
    def hexAt(i: Int): String =
      s"(strpos('0123456789abcdef', substr(perm, $i, 1)) - 1)"
    val kb = EpochCursorSeqs * PackBudget
    s"""WITH ${DedupModels.spanTrimSqlCtes},
       |d AS (SELECT doc_id,
       |             cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |             md5('0:' || cast(doc_id AS VARCHAR)) AS perm
       |      FROM trimmed),
       |s AS (SELECT *,
       |             (${hexAt(1)} * 4096 + ${hexAt(2)} * 256 +
       |              ${hexAt(3)} * 16 + ${hexAt(4)}) % $EpochShards AS shard
       |      FROM d),
       |p AS (SELECT shard, n_tokens,
       |             row_number() OVER (PARTITION BY shard
       |               ORDER BY perm, doc_id) AS shard_pos
       |      FROM s),
       |o AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard
       |               ORDER BY shard_pos ROWS BETWEEN UNBOUNDED PRECEDING
       |               AND CURRENT ROW) AS end_offset
       |      FROM p),
       |q AS (SELECT shard, shard_pos,
       |             cast(end_offset - n_tokens AS BIGINT) AS start_offset,
       |             cast((end_offset - n_tokens + $kb - 1) // $kb AS BIGINT)
       |               AS first_cp,
       |             cast((end_offset - 1) // $kb AS BIGINT) AS last_cp
       |      FROM o WHERE n_tokens > 0),
       |e AS (SELECT shard, shard_pos, start_offset,
       |             unnest(range(first_cp, last_cp + 1)) AS cp
       |      FROM q WHERE last_cp >= first_cp)
       |SELECT cast(shard AS BIGINT) AS shard,
       |       cast(cp * $EpochCursorSeqs AS BIGINT) AS seq,
       |       cast(shard_pos AS BIGINT) AS row_pos,
       |       cast(cp * $kb - start_offset AS BIGINT) AS skip_tokens
       |FROM e""".stripMargin
  }

  val epochShuffleOracle: String = {
    def hexAt(i: Int): String =
      s"(strpos('0123456789abcdef', substr(perm, $i, 1)) - 1)"
    s"""WITH ${DedupModels.spanTrimSqlCtes},
       |d AS (SELECT doc_id,
       |             cast(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |             md5('0:' || cast(doc_id AS VARCHAR)) AS perm
       |      FROM trimmed),
       |s AS (SELECT *,
       |             (${hexAt(1)} * 4096 + ${hexAt(2)} * 256 +
       |              ${hexAt(3)} * 16 + ${hexAt(4)}) % $EpochShards AS shard
       |      FROM d)
       |SELECT doc_id, cast(shard AS BIGINT) AS shard,
       |       cast(row_number() OVER (PARTITION BY shard
       |              ORDER BY perm, doc_id) AS BIGINT) AS shard_pos,
       |       n_tokens, perm
       |FROM s""".stripMargin
  }
}
