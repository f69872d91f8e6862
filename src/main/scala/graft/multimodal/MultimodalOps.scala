package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a decode → feature-extract stage.
  *
  * The decode step parses REAL image headers in pure JVM —
  * [[headerDecode]] reads PNG IHDR and JPEG SOF frame headers
  * (width/height/channels from the first bytes; no codec needed) — and
  * falls back to [[fakeDecode]]'s deterministic pseudo-metadata for
  * payloads that aren't recognizable images (the text-byte fixtures of
  * m02/m03). Full pixel decode/resample still needs a codec library
  * this container doesn't ship; the Spark-side plumbing is what a
  * production decoder drops into: a typed Dataset, `mapPartitions` for
  * per-partition batch processing (the Scala analog of `mapInPandas` —
  * one iterator per partition so a decoder can amortize model/codec
  * init), and a binary+metadata schema.
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

  /** Pure-JVM image header parse: (width, height, channels) from the
    * leading bytes of a PNG (signature + IHDR chunk: width/height at
    * offsets 16/20, color type at 25) or JPEG (marker walk to the first
    * SOFn frame header). None for anything unrecognizable — callers
    * fall back to [[fakeDecode]]. This is the real decode a metadata
    * summary needs; pixel data is never touched.
    */
  def headerDecode(b: Array[Byte]): Option[(Int, Int, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    val pngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    if (b.length >= 26 && pngSig.indices.forall(i => u8(i) == pngSig(i)) &&
        new String(b, 12, 4, "US-ASCII") == "IHDR") {
      // color type → samples per pixel (PNG spec §4.1.1)
      val channels = u8(25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette index
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return None
      }
      Some((be32(16), be32(20), channels))
    } else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // walk JPEG segments to the first SOFn (frame) header
      var i = 2
      while (i + 4 <= b.length) {
        if (u8(i) != 0xff) return None
        // consecutive 0xFF bytes before a marker are legal fill/padding
        // (JPEG spec B.1.1.2) — skip them so the byte after the run is
        // read as the marker, not mistaken for a length-carrying segment
        while (i + 4 <= b.length && u8(i + 1) == 0xff) i += 1
        val marker = u8(i + 1)
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) {
          i += 2 // standalone markers carry no length field
        } else if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          // SOFn payload: len(2) precision(1) height(2) width(2) ncomp(1)
          if (i + 9 >= b.length) return None
          return Some((be16(i + 7), be16(i + 5), u8(i + 9)))
        } else {
          i += 2 + be16(i + 2)
        }
      }
      None
    } else None
  }

  /** Fallback decoder for non-image payloads — deterministic
    * pseudo-metadata from the bytes' md5, standing in for codecs (audio
    * duration, video streams) the container doesn't ship.
    */
  def fakeDecode(media: Array[Byte]): (Int, Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5").digest(media)
    def u(i: Int): Int = md(i) & 0xff
    (64 + u(0) * 8, 64 + u(1) * 8, if (u(2) % 2 == 0) 3 else 1)
  }

  /** The decode entry used by [[decodeFeatures]]: real header parse
    * first, md5 fallback for unrecognized payloads. */
  def decode(media: Array[Byte]): (Int, Int, Int) =
    headerDecode(media).getOrElse(fakeDecode(media))

  /** Lift the documents table into a media table: text bytes as the
    * opaque payload (non-image payloads exercise the fakeDecode
    * fallback; the schema and partition behavior are what's under
    * test for m02/m03).
    */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id", encode($"text", "UTF-8").as("media"),
        concat(lit("fake/"), $"lang").as("format"))
      .as[MediaRecord]
  }

  // ---- deterministic image-binary generators (the m01 fixture) -----
  // Real, spec-valid headers assembled byte-by-byte in pure JVM. Pixel
  // payloads are empty/absent (header parsing never reads them), which
  // also makes every generated file a CONSTANT size per format — the
  // property the DuckDB oracle's byte accounting relies on.

  private def beInt(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngChunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(payload)
    beInt(payload.length) ++ tb ++ payload ++ beInt(crc.getValue.toInt)
  }

  /** A minimal valid PNG: signature, IHDR with the given dims/color
    * type, an IDAT holding the fixed 8-byte zlib stream for empty input,
    * IEND. Always [[PngBytesLen]] (65) bytes. */
  def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    val ihdr = beInt(w) ++ beInt(h) ++
      Array[Byte](8, colorType.toByte, 0, 0, 0)
    val emptyZlib = Array(0x78, 0x9c, 0x03, 0x00, 0x00, 0x00, 0x00, 0x01)
      .map(_.toByte)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", emptyZlib) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  /** A minimal valid JPEG: SOI, JFIF APP0, an SOF0 frame header with
    * the given dims and 3 components, EOI. Always [[JpegBytesLen]] (41)
    * bytes. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def m(a: Int, b: Int) = Array(a.toByte, b.toByte)
    val app0 = m(0xff, 0xe0) ++ m(0x00, 0x10) ++
      "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = m(0xff, 0xc0) ++ m(0x00, 0x11) ++ Array[Byte](8) ++
      m(h >>> 8, h & 0xff) ++ m(w >>> 8, w & 0xff) ++ Array[Byte](3) ++
      Array[Byte](1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0)
    m(0xff, 0xd8) ++ app0 ++ sof0 ++ m(0xff, 0xd9)
  }

  /** Generated-file sizes — the oracle-side byte-accounting constants
    * (pinned by MultimodalSpec). */
  val PngBytesLen = 65
  val JpegBytesLen = 41

  /** m01's media table: one REAL image binary per document, with
    * dimensions and format derived from doc_id ALONE —
    * `w = 16 + id%64`, `h = 16 + (id/7)%64`, `id%3 ∈` {RGB PNG,
    * grayscale PNG, JPEG} — so the DuckDB oracle recomputes the
    * expected metadata arithmetically while the Spark side actually
    * PARSES it back out of the bytes it generated.
    */
  def imageTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .map { id =>
        val w = 16 + (id % 64).toInt
        val h = 16 + ((id / 7) % 64).toInt
        (id % 3) match {
          case 0 => MediaRecord(id, pngBytes(w, h, 2), "image/png")
          case 1 => MediaRecord(id, pngBytes(w, h, 0), "image/png")
          case _ => MediaRecord(id, jpegBytes(w, h), "image/jpeg")
        }
      }
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
        val (w, h, c) = decode(r.media)
        MediaFeatures(r.doc_id, r.format, r.media.length, w, h, c)
      }
    }
  }

  /** The SQL replay of `fakeDecode` over the media table — (doc_id,
    * lang, byte_len, width, height, channels) — the m03 fixture path.
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

  /** m01: per-format media metadata summary over REAL image binaries —
    * generate ([[imageTable]]), parse the headers back out through the
    * mapPartitions decode path ([[decodeFeatures]] → [[headerDecode]]),
    * aggregate. The oracle recomputes the same metadata from
    * imageTable's doc_id arithmetic (dims) and the constant generated
    * file sizes — DuckDB never needs to parse a PNG.
    */
  def mediaMetaSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeFeatures(imageTable(spark, sfDir))
      .groupBy($"format")
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

  /** The arithmetic twin of [[imageTable]] + [[headerDecode]]: dims
    * replay the doc_id derivation, byte lengths are the constant
    * generated-file sizes (65 PNG / 41 JPEG, pinned in
    * MultimodalSpec). */
  val mediaMetaSummaryOracle: String =
    s"""WITH img AS (
       |  SELECT doc_id,
       |         16 + (doc_id % 64) AS width,
       |         16 + ((doc_id // 7) % 64) AS height,
       |         CASE WHEN doc_id % 3 = 2 THEN 'image/jpeg'
       |              ELSE 'image/png' END AS format,
       |         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels,
       |         CASE WHEN doc_id % 3 = 2 THEN $JpegBytesLen
       |              ELSE $PngBytesLen END AS byte_len
       |  FROM documents)
       |SELECT format,
       |       count(*) AS media_count,
       |       cast(sum(byte_len) AS BIGINT) AS total_bytes,
       |       cast(sum(width) AS BIGINT) AS width_sum,
       |       cast(sum(height) AS BIGINT) AS height_sum,
       |       cast(sum(channels) AS BIGINT) AS channel_sum
       |FROM img GROUP BY 1""".stripMargin
}
