package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a decode → feature-extract stage.
  *
  * The decode step is a STUB (this container has no image/audio codecs):
  * `fakeDecode` derives deterministic pseudo-metadata from the bytes'
  * md5. The Spark-side plumbing is real and is what a production decoder
  * would drop into: a typed Dataset, `mapPartitions` for per-partition
  * batch processing (the Scala analog of `mapInPandas` — one iterator
  * per partition so a decoder can amortize model/codec init), and a
  * binary+metadata schema.
  *
  * Scale: decode is embarrassingly parallel over partitions; binary
  * payloads never shuffle (features are extracted before any wide op),
  * and `spark.sql.files.maxPartitionBytes` bounds per-task memory.
  */
object MultimodalOps {

  /** A media row: opaque payload + declared format. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], format: String)

  /** Extracted features; width/height/channels are decoder outputs. */
  final case class MediaFeatures(
      doc_id: Long, format: String, byte_len: Int,
      width: Int, height: Int, channels: Int)

  /** STUB decoder — deterministic fake standing in for a real codec.
    * A production build replaces ONLY this function (same signature):
    * bytes in, dimensions out.
    */
  def fakeDecode(media: Array[Byte]): (Int, Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(media)
    def u(i: Int): Int = md(i) & 0xff
    (64 + u(0) * 8, 64 + u(1) * 8, if (u(2) % 2 == 0) 3 else 1)
  }

  /** Lift the documents table into a media table: text bytes as the
    * opaque payload (the fixture has no real images; the schema and
    * partition behavior are what's under test).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"),
        concat(lit("fake/"), $"lang").as("format"))
      .as[MediaRecord]
  }

  /** Decode + feature-extract via mapPartitions: the iterator shape lets
    * a real decoder initialize once per partition (codec handles, model
    * weights) and stream records through — the same batch contract
    * `mapInPandas` gives Python decoders.
    */
  def decodeFeatures(ds: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition init would go here (codec/context setup)
      it.map { r =>
        val (w, h, c) = fakeDecode(r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, w, h, c)
      }
    }
  }

  /** m01: per-format media metadata summary. The md5-derived fake dims
    * are reproduced in pure SQL so the whole pipeline (binary encode →
    * "decode" → aggregate) stays oracle-checkable; `decodeFeatures`
    * computes the same values through the mapPartitions path (asserted
    * equal in MultimodalSpec).
    */
  /** The SQL replay of `fakeDecode` over the media table — (doc_id,
    * lang, byte_len, width, height, channels) — shared by m01 and m03.
    */
  private def decodedMediaSql(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val hexVal: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => (instr(lit("0123456789abcdef"), c) - 1).cast(IntegerType)
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", encode($"text", "UTF-8").as("media"))
      .withColumn("byte_len", octet_length($"media"))
      .withColumn("h", md5($"media"))
      // same bytes fakeDecode reads: md5 byte 0 = hex digits 1-2, etc.
      .withColumn("width",
        lit(64) + (hexVal(substring($"h", 1, 1)) * 16 +
          hexVal(substring($"h", 2, 1))) * 8)
      .withColumn("height",
        lit(64) + (hexVal(substring($"h", 3, 1)) * 16 +
          hexVal(substring($"h", 4, 1))) * 8)
      .withColumn("channels",
        when((hexVal(substring($"h", 5, 1)) * 16 +
          hexVal(substring($"h", 6, 1))) % 2 === 0, 3).otherwise(1))
  }

  def mediaMetaSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodedMediaSql(spark, sfDir)
      .groupBy(concat(lit("fake/"), $"lang").as("format"))
      .agg(count(lit(1)).as("media_count"),
        sum($"byte_len").cast(LongType).as("total_bytes"),
        sum($"width").cast(LongType).as("width_sum"),
        sum($"height").cast(LongType).as("height_sum"),
        sum($"channels").cast(LongType).as("channel_sum"))
  }

  /** m03: resize planning + thumbnail cost accounting — the
    * feature-extract stage a vision-data pipeline runs after decode:
    * aspect-preserving fit of each image into a 224-square (the
    * standard vision-model input box), with the output dimensions and
    * thumbnail byte cost computed in exact integer arithmetic
    * (`out = (dim * 224) div long_side` — floor division agrees across
    * engines) so the whole stage stays oracle-checkable. The actual
    * pixel resample belongs in [[resizePlan]]'s typed path next to
    * `fakeDecode` (no codecs in this container; the planning math and
    * the plumbing are what's under test).
    */
  def resizeSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodedMediaSql(spark, sfDir)
      .withColumn("long_side", greatest($"width", $"height"))
      .withColumn("out_w", expr("(width * 224) div long_side"))
      .withColumn("out_h", expr("(height * 224) div long_side"))
      .groupBy(concat(lit("fake/"), $"lang").as("format"))
      .agg(count(lit(1)).as("media_count"),
        sum($"out_w").cast(LongType).as("out_width_sum"),
        sum($"out_h").cast(LongType).as("out_height_sum"),
        sum(($"out_w" * $"out_h" * $"channels").cast(LongType))
          .cast(LongType).as("thumb_bytes"),
        sum(when($"width" >= $"height", 1L).otherwise(0L))
          .as("landscape_count"))
  }

  /** Typed resize plan over the mapPartitions decode path — the shape a
    * real resampler drops into (MultimodalSpec asserts it agrees with
    * the SQL replay). */
  final case class ResizePlan(
      doc_id: Long, format: String, out_w: Int, out_h: Int,
      thumb_bytes: Long)

  def resizePlan(ds: Dataset[MediaFeatures]): Dataset[ResizePlan] = {
    import ds.sparkSession.implicits._
    ds.map { f =>
      val longSide = math.max(f.width, f.height)
      val w = f.width * 224 / longSide
      val h = f.height * 224 / longSide
      ResizePlan(f.doc_id, f.format, w, h, w.toLong * h * f.channels)
    }
  }

  /** m02: frame sampling — the video-pipeline operation of decoding
    * only every k-th frame. The payload is modeled as a sequence of
    * fixed-width frames (200-char slices of the text payload — this
    * DuckDB build cannot slice BLOBs, and a char slice md5-hashes its
    * UTF-8 bytes identically in both engines, so the sampling algebra
    * stays oracle-checkable; a production build slices the binary and
    * decodes inside mapPartitions like m01's contract). Stride is
    * ceil(n_frames/8), so ≤8 frames are sampled per document regardless
    * of length — the budget-bounded sampling a real frame extractor
    * uses.
    *
    * Scale: only the SAMPLED indices are generated (a strided
    * `sequence`, not an explode-all-then-filter), so the fan-out is a
    * hard ≤8 rows/doc; the heavy payload column is dropped right after
    * slicing, so the shuffle carries only (doc_id, hash) pairs.
    */
  def frameSampleSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val FrameChars = 200
    val MaxSampled = 8
    val d = graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"text")
      .withColumn("n_frames",
        greatest(lit(1), expr(s"length(text) div $FrameChars")))
      .withColumn("stride",
        expr(s"(n_frames + ${MaxSampled - 1}) div $MaxSampled"))
    d.withColumn("i",
        explode(sequence(lit(0), $"n_frames" - 1, $"stride")))
      .withColumn("frame_hash",
        md5(expr(s"substring(text, i * $FrameChars + 1, $FrameChars)")))
      .groupBy($"doc_id", concat(lit("fake/"), $"lang").as("format"),
        $"n_frames".cast(LongType).as("n_frames"))
      .agg(count(lit(1)).as("sampled_frames"),
        countDistinct($"frame_hash").as("distinct_frames"),
        min($"frame_hash").as("rep_hash"))
  }

  val frameSampleSummaryOracle: String =
    """WITH p AS (
      |  SELECT doc_id, lang, text,
      |         greatest(1, length(text) // 200) AS n_frames,
      |         (greatest(1, length(text) // 200) + 7) // 8 AS stride
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, lang, n_frames,
      |         md5(substr(text, i * 200 + 1, 200)) AS frame_hash
      |  FROM (SELECT *, unnest(range(0, n_frames, stride)) AS i FROM p))
      |SELECT doc_id, 'fake/' || lang AS format,
      |       cast(n_frames AS BIGINT) AS n_frames,
      |       count(*) AS sampled_frames,
      |       count(DISTINCT frame_hash) AS distinct_frames,
      |       min(frame_hash) AS rep_hash
      |FROM f GROUP BY 1, 2, 3""".stripMargin

  /** Shared decoded-media CTE prefix for the m01/m03 oracles. */
  private val decodedCtes: String =
    """media AS (
      |  SELECT doc_id, lang, encode(text) AS media,
      |         octet_length(encode(text)) AS byte_len,
      |         md5(text) AS h
      |  FROM documents),
      |decoded AS (
      |  SELECT doc_id, lang, byte_len,
      |         64 + ((strpos('0123456789abcdef', substr(h,1,1)) - 1) * 16 +
      |               (strpos('0123456789abcdef', substr(h,2,1)) - 1)) * 8 AS width,
      |         64 + ((strpos('0123456789abcdef', substr(h,3,1)) - 1) * 16 +
      |               (strpos('0123456789abcdef', substr(h,4,1)) - 1)) * 8 AS height,
      |         CASE WHEN ((strpos('0123456789abcdef', substr(h,5,1)) - 1) * 16 +
      |                    (strpos('0123456789abcdef', substr(h,6,1)) - 1)) % 2 = 0
      |              THEN 3 ELSE 1 END AS channels
      |  FROM media)""".stripMargin

  lazy val resizeSummaryOracle: String =
    s"""WITH $decodedCtes,
       |resized AS (
       |  SELECT lang, channels, width, height,
       |         (width * 224) // greatest(width, height) AS out_w,
       |         (height * 224) // greatest(width, height) AS out_h
       |  FROM decoded)
       |SELECT 'fake/' || lang AS format,
       |       count(*) AS media_count,
       |       cast(sum(out_w) AS BIGINT) AS out_width_sum,
       |       cast(sum(out_h) AS BIGINT) AS out_height_sum,
       |       cast(sum(out_w * out_h * channels) AS BIGINT) AS thumb_bytes,
       |       cast(sum(CASE WHEN width >= height THEN 1 ELSE 0 END) AS BIGINT)
       |         AS landscape_count
       |FROM resized GROUP BY 1""".stripMargin

  val mediaMetaSummaryOracle: String =
    """WITH media AS (
      |  SELECT doc_id, lang, encode(text) AS media,
      |         octet_length(encode(text)) AS byte_len,
      |         md5(text) AS h
      |  FROM documents),
      |decoded AS (
      |  SELECT lang, byte_len,
      |         64 + ((strpos('0123456789abcdef', substr(h,1,1)) - 1) * 16 +
      |               (strpos('0123456789abcdef', substr(h,2,1)) - 1)) * 8 AS width,
      |         64 + ((strpos('0123456789abcdef', substr(h,3,1)) - 1) * 16 +
      |               (strpos('0123456789abcdef', substr(h,4,1)) - 1)) * 8 AS height,
      |         CASE WHEN ((strpos('0123456789abcdef', substr(h,5,1)) - 1) * 16 +
      |                    (strpos('0123456789abcdef', substr(h,6,1)) - 1)) % 2 = 0
      |              THEN 3 ELSE 1 END AS channels
      |  FROM media)
      |SELECT 'fake/' || lang AS format,
      |       count(*) AS media_count,
      |       cast(sum(byte_len) AS BIGINT) AS total_bytes,
      |       cast(sum(width) AS BIGINT) AS width_sum,
      |       cast(sum(height) AS BIGINT) AS height_sum,
      |       cast(sum(channels) AS BIGINT) AS channel_sum
      |FROM decoded GROUP BY 1""".stripMargin
}
