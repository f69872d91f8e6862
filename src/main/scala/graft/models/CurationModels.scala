package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data CURATION operators over `documents` — the two pipeline
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
  *
  * All hash math is md5-builtin (DedupModels' convention) so both
  * operators stay oracle-checkable end-to-end.
  *
  * Scale: c01's join is gram-hash equi (shuffle keyed on the digest —
  * uniformly distributed, no skew); the eval side is |eval|-bounded and
  * AQE broadcasts it when it fits, while corpus grams stream through a
  * distinct + count — never an all-pairs compare. c02 is a pure
  * map-side projection: zero shuffles beyond the final aggregate-free
  * write.
  */
object CurationModels {
  import graft.catalog.Tables
  import DedupModels.{normText, tokens, normSqlDuck}

  /** The held-out "benchmark" slice of the fixture: one source column
    * value — deterministic and non-empty at every SF. */
  private val EvalSource = "src0"
  private val N = 5 // word n-gram width for containment

  /** Distinct (doc_id, source, gram-md5) triples; docs shorter than N
    * tokens carry no grams (nothing to match on). */
  private def gramDf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", tokens($"text").as("toks"))
      .filter(size($"toks") >= N)
      .select($"doc_id", $"source",
        explode(transform(sequence(lit(1), size($"toks") - (N - 1)),
          i => md5(concat_ws(" ",
            (0 until N).map(o => element_at($"toks", i + o)): _*))))
          .as("gram"))
      .distinct()
  }

  /** c01: corpus documents contaminated by eval n-grams — per flagged
    * doc: its distinct-gram total, how many grams also occur anywhere
    * in the eval slice, the containment ratio (exact integer micros),
    * and a review flag at ≥20% containment (integer compare, no
    * float threshold drift).
    */
  def decontamination(spark: SparkSession, sfDir: String): DataFrame = {
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
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hexVal: Column => Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(IntegerType)
    val threshold = Per256.foldRight(lit(DefaultPer256): Column) {
      case ((lang, t), acc) => when($"lang" === lang, lit(t)).otherwise(acc)
    }
    Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang",
        md5($"doc_id".cast(StringType)).as("h"))
      .withColumn("bucket",
        hexVal(substring($"h", 1, 1)) * 16 + hexVal(substring($"h", 2, 1)))
      .withColumn("kept", $"bucket" < threshold)
      .select($"doc_id", $"lang", $"bucket".cast(LongType).as("bucket"),
        $"kept")
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
}
