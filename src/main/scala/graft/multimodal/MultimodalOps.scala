package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus a decode → feature-extract stage.
  *
  * The decode step parses REAL media structure in pure JVM —
  * [[headerDecode]] reads PNG IHDR and JPEG SOF frame headers
  * (width/height/channels from the first bytes) and [[gifDecode]]
  * walks a GIF's full block structure (frame count + per-frame delays,
  * no LZW decode needed) — falling back to [[fakeDecode]]'s
  * deterministic pseudo-metadata only for payloads that aren't
  * recognizable media (audio/video stand-ins). Full pixel
  * decode/resample still needs a codec library this container doesn't
  * ship; the Spark-side plumbing is what a production decoder drops
  * into: a typed Dataset, `mapPartitions` for per-partition batch
  * processing (the Scala analog of `mapInPandas` — one iterator per
  * partition so a decoder can amortize model/codec init), and a
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
    * opaque payload — the non-image fixture that exercises the
    * fakeDecode fallback path (audio/video stand-ins with no parseable
    * image header).
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

  /** A minimal valid multi-frame GIF89a: header + logical screen
    * descriptor (no global color table), then per frame a graphic
    * control extension carrying its delay (centiseconds, little-endian
    * — GIF is the LE sibling of PNG/JPEG's big-endian headers), a
    * full-screen image descriptor, and a minimal LZW data section;
    * trailer byte last. Constant size per frame count:
    * [[GifBytesBase]] + [[GifBytesPerFrame]]·frames — the property the
    * oracle's byte accounting relies on.
    */
  def gifBytes(w: Int, h: Int, delaysCs: Seq[Int]): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "GIF89a".getBytes("US-ASCII")
    out ++= le16(w); out ++= le16(h)
    out ++= Array[Byte](0x00, 0, 0) // no global color table; bg; aspect
    for (d <- delaysCs) {
      out ++= Array(0x21, 0xf9, 0x04, 0x00).map(_.toByte) // GCE
      out ++= le16(d); out ++= Array[Byte](0, 0)
      out += 0x2c.toByte // image descriptor: full-screen frame
      out ++= le16(0); out ++= le16(0); out ++= le16(w); out ++= le16(h)
      out += 0x00 // no local color table
      // minimal LZW section: min code size, one 1-byte sub-block, term
      out ++= Array[Byte](2, 1, 0x44, 0)
    }
    out += 0x3b.toByte
    out.toArray
  }

  /** Parsed animation metadata: screen dims, frame count, per-frame
    * delays (centiseconds) in frame order. */
  final case class AnimMeta(
      width: Int, height: Int, frames: Int, delaysCs: Seq[Int])

  /** Pure-JVM GIF block walk (the multi-frame sibling of
    * [[headerDecode]]): signature + logical screen descriptor, skip the
    * global color table if flagged, then walk extension and
    * image-descriptor blocks counting frames and collecting each
    * graphic-control delay, to the trailer. Sub-block chains are
    * SKIPPED by their length prefixes — pixel data is never LZW-decoded
    * (frame counts/delays/dims are header metadata, same contract as
    * the still-image parse). None for anything unrecognizable or
    * truncated.
    */
  def gifDecode(b: Array[Byte]): Option[AnimMeta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    try {
      if (b.length < 14) return None
      val sig = new String(b, 0, 6, "US-ASCII")
      if (sig != "GIF89a" && sig != "GIF87a") return None
      val (w, h, packed) = (le16(6), le16(8), u8(10))
      var i = 13
      if ((packed & 0x80) != 0) i += 3 * (1 << ((packed & 7) + 1))
      var frames = 0
      var pendingDelay = 0 // GCE governs the NEXT image descriptor
      val delays = scala.collection.mutable.ArrayBuffer[Int]()
      while (i < b.length) {
        u8(i) match {
          case 0x3b => return Some(AnimMeta(w, h, frames, delays.toSeq))
          case 0x21 => // extension: label, then a sub-block chain
            if (u8(i + 1) == 0xf9 && u8(i + 2) == 4)
              pendingDelay = le16(i + 4)
            i += 2
            while (u8(i) != 0) i += u8(i) + 1
            i += 1
          case 0x2c => // image descriptor (one frame)
            frames += 1
            delays += pendingDelay
            pendingDelay = 0
            val p = u8(i + 9)
            i += 10
            if ((p & 0x80) != 0) i += 3 * (1 << ((p & 7) + 1))
            i += 1 // LZW minimum code size
            while (u8(i) != 0) i += u8(i) + 1
            i += 1
          case _ => return None
        }
      }
      None // ran off the end without a trailer
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Generated-file sizes — the oracle-side byte-accounting constants
    * (pinned by MultimodalSpec). */
  val PngBytesLen = 65
  val JpegBytesLen = 41
  val GifBytesBase = 14
  val GifBytesPerFrame = 22

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

  /** m02's media table: one REAL animated GIF per document, frame count
    * and per-frame delays derived from doc_id ALONE — `frames =
    * 1 + id%24`, `delay_i = 4 + (id+i)%10` cs, screen `w = 32 + id%48`,
    * `h = 32 + (id div 5)%48` — so the DuckDB oracle recomputes every
    * expected value arithmetically while the Spark side actually walks
    * the frame structure it generated (the m01 pattern, multi-frame).
    */
  def animationTable(spark: SparkSession, sfDir: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .map { id =>
        val frames = 1 + (id % 24).toInt
        val delays = (0 until frames).map(i => 4 + ((id + i) % 10).toInt)
        val w = 32 + (id % 48).toInt
        val h = 32 + ((id / 5) % 48).toInt
        MediaRecord(id, gifBytes(w, h, delays), "image/gif")
      }
  }

  /** Parsed per-document animation features (delays in frame order). */
  final case class AnimFeatures(
      doc_id: Long, format: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, delays: Seq[Int])

  /** The animation decode path — same mapPartitions batch contract as
    * [[decodeFeatures]], walking real frame structure ([[gifDecode]]).
    * Unparseable payloads decode as zero-frame records rather than
    * failing the stage (a production pipeline quarantines them).
    */
  def decodeAnimations(ds: Dataset[MediaRecord]): Dataset[AnimFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.map { r =>
        val m = gifDecode(r.media)
          .getOrElse(AnimMeta(0, 0, 0, Nil))
        AnimFeatures(r.doc_id, r.format, r.media.length,
          m.width, m.height, m.frames, m.delaysCs)
      }
    }
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
    * standard vision-model input box), with output dimensions and
    * thumbnail byte cost in exact integer arithmetic
    * (`out = (dim * 224) div long_side` — floor division agrees across
    * engines) so the whole stage stays oracle-checkable.
    *
    * Inputs are REAL image binaries: [[imageTable]]'s generated
    * PNG/JPEGs parsed back through the mapPartitions decode path
    * ([[decodeFeatures]] → [[headerDecode]]) and planned by the typed
    * [[resizePlan]] — no pseudo-metadata anywhere. The oracle replays
    * imageTable's doc_id arithmetic instead of parsing; `landscape ⟺
    * width ≥ height ⟺ out_w ≥ out_h` under aspect-preserving floor
    * fit, so both sides agree on the flag without sharing code.
    */
  def resizeSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    resizePlan(decodeFeatures(imageTable(spark, sfDir)))
      .groupBy($"format")
      .agg(count(lit(1)).as("media_count"),
        sum($"out_w".cast(LongType)).as("out_width_sum"),
        sum($"out_h".cast(LongType)).as("out_height_sum"),
        sum($"thumb_bytes").cast(LongType).as("thumb_bytes"),
        sum(when($"out_w" >= $"out_h", 1L).otherwise(0L))
          .as("landscape_count"))
  }

  /** Typed resize plan over the mapPartitions decode path — the shape a
    * real resampler drops into; m03 ([[resizeSummary]]) aggregates it
    * directly. */
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

  /** m02: frame sampling over REAL multi-frame media — decode only
    * every k-th frame, the core video-pipeline budget operation. Inputs
    * are [[animationTable]]'s generated GIFs; the frame counts, screen
    * dims, and per-frame delays come from WALKING THE BYTES
    * ([[decodeAnimations]] → [[gifDecode]]), never from the generator's
    * arithmetic. Stride is ceil(n_frames/8), so ≤8 frames are sampled
    * per document regardless of length; the output accounts both the
    * full animation (n_frames, total_delay_cs, byte_len) and the
    * sampled subset (sampled_frames, sampled_delay_cs).
    *
    * Scale: only the SAMPLED indices are generated (a strided
    * `sequence`, not an explode-all-then-filter), so the fan-out is a
    * hard ≤8 rows/doc; the binary payload is dropped at decode, so
    * the shuffle carries only (doc_id, small ints) rows.
    */
  def frameSampleSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val MaxSampled = 8
    decodeAnimations(animationTable(spark, sfDir)).toDF()
      .withColumn("stride",
        expr(s"(n_frames + ${MaxSampled - 1}) div $MaxSampled"))
      // whole-animation accounting from the parsed delay list
      .withColumn("total_delay_cs",
        expr("aggregate(delays, 0L, (acc, d) -> acc + d)"))
      .withColumn("i",
        explode(sequence(lit(0), $"n_frames" - 1, $"stride")))
      .withColumn("d_i",
        element_at($"delays", ($"i" + 1).cast(IntegerType)))
      .groupBy($"doc_id", $"format",
        $"n_frames".cast(LongType).as("n_frames"),
        $"byte_len".cast(LongType).as("byte_len"),
        $"total_delay_cs")
      .agg(count(lit(1)).as("sampled_frames"),
        sum($"d_i".cast(LongType)).as("sampled_delay_cs"))
  }

  /** The arithmetic twin of [[animationTable]] + [[gifDecode]]: frame
    * counts/delays replay the doc_id derivation, byte lengths are the
    * constant per-frame file-size accounting (14 + 22·frames, pinned in
    * MultimodalSpec) — DuckDB never parses a GIF. */
  val frameSampleSummaryOracle: String =
    s"""WITH anim AS (
       |  SELECT doc_id,
       |         1 + (doc_id % 24) AS n_frames,
       |         (1 + (doc_id % 24) + 7) // 8 AS stride
       |  FROM documents),
       |tot AS (
       |  SELECT doc_id,
       |         cast(sum(4 + ((doc_id + i) % 10)) AS BIGINT) AS total_delay_cs
       |  FROM (SELECT doc_id, unnest(range(0, n_frames)) AS i FROM anim)
       |  GROUP BY 1),
       |samp AS (
       |  SELECT doc_id, count(*) AS sampled_frames,
       |         cast(sum(4 + ((doc_id + i) % 10)) AS BIGINT) AS sampled_delay_cs
       |  FROM (SELECT doc_id, unnest(range(0, n_frames, stride)) AS i FROM anim)
       |  GROUP BY 1)
       |SELECT a.doc_id, 'image/gif' AS format,
       |       cast(a.n_frames AS BIGINT) AS n_frames,
       |       cast($GifBytesBase + $GifBytesPerFrame * a.n_frames AS BIGINT)
       |         AS byte_len,
       |       t.total_delay_cs, s.sampled_frames, s.sampled_delay_cs
       |FROM anim a
       |JOIN tot t ON a.doc_id = t.doc_id
       |JOIN samp s ON a.doc_id = s.doc_id""".stripMargin

  /** The arithmetic twin of [[imageTable]] + [[headerDecode]] +
    * [[resizePlan]] for m03 (same convention as
    * [[mediaMetaSummaryOracle]]). */
  val resizeSummaryOracle: String =
    """WITH img AS (
      |  SELECT doc_id,
      |         16 + (doc_id % 64) AS width,
      |         16 + ((doc_id // 7) % 64) AS height,
      |         CASE WHEN doc_id % 3 = 2 THEN 'image/jpeg'
      |              ELSE 'image/png' END AS format,
      |         CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels
      |  FROM documents),
      |resized AS (
      |  SELECT format, channels, width, height,
      |         (width * 224) // greatest(width, height) AS out_w,
      |         (height * 224) // greatest(width, height) AS out_h
      |  FROM img)
      |SELECT format,
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

  // ===== m04: audio (WAV) — the third modality beside stills and
  // animations =====

  /** A minimal valid PCM WAV: RIFF header, canonical 16-byte fmt
    * chunk, and a data chunk of `nSamples` zeroed frames — 44 header
    * bytes plus block-aligned payload, the layout every real WAV
    * reader expects. */
  def wavBytes(rate: Int, channels: Int, bits: Int, nSamples: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array(
      (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    val blockAlign = channels * (bits / 8)
    val dataLen = nSamples * blockAlign
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "RIFF".getBytes("US-ASCII")
    out ++= le32(36 + dataLen)
    out ++= "WAVE".getBytes("US-ASCII")
    out ++= "fmt ".getBytes("US-ASCII")
    out ++= le32(16)
    out ++= le16(1) // PCM
    out ++= le16(channels)
    out ++= le32(rate)
    out ++= le32(rate * blockAlign) // byte rate
    out ++= le16(blockAlign)
    out ++= le16(bits)
    out ++= "data".getBytes("US-ASCII")
    out ++= le32(dataLen)
    out ++= Array.fill[Byte](dataLen)(0)
    out.toArray
  }

  /** Parsed audio metadata (sample count from the data chunk's length,
    * never from the generator). */
  final case class WavMeta(rate: Int, channels: Int, bits: Int, nSamples: Int)

  /** Pure-JVM RIFF chunk walk (the audio sibling of [[headerDecode]]):
    * verify RIFF/WAVE, then walk chunks by their length prefixes —
    * `fmt ` yields (rate, channels, bits), `data` yields the payload
    * length, any other chunk is SKIPPED (real WAVs carry LIST/fact
    * chunks) — until both are seen. Sample data is never read. None
    * for anything unrecognizable, truncated, or non-PCM. */
  def wavDecode(b: Array[Byte]): Option[WavMeta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    try {
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None
      var dataLen = -1
      while (i + 8 <= b.length && (fmt.isEmpty || dataLen < 0)) {
        val (id, len) = (tag(i), le32(i + 4))
        // a negative length (crafted/corrupt 32-bit field) would make the
        // advance below a no-op or step backwards — unrecognizable, like
        // mp4Decode's `len < 8` guard
        if (len < 0) return None
        if (id == "fmt ") {
          if (le16(i + 8) != 1) return None // PCM only
          fmt = Some((le32(i + 12), le16(i + 10), le16(i + 22)))
        } else if (id == "data") dataLen = len
        i += 8 + len + (len & 1) // chunks are word-aligned
      }
      fmt match {
        case Some((rate, ch, bits))
            if dataLen >= 0 && ch > 0 && bits % 8 == 0 && bits > 0 =>
          val blockAlign = ch * (bits / 8)
          if (dataLen % blockAlign != 0) None
          else Some(WavMeta(rate, ch, bits, dataLen / blockAlign))
        case _ => None
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** m04's media table: one REAL WAV binary per document, every
    * parameter derived from doc_id ALONE — `rate ∈ {8000, 16000,
    * 22050, 44100}` by id%4, `channels = 1 + (id div 7)%2`, `bits ∈ {8, 16}`
    * by (id div 3)%2, `n_samples = 64 + id%128` — the m01/m02 pattern:
    * the oracle recomputes the expected metadata arithmetically while
    * the Spark side actually walks the RIFF chunks it generated. */
  def audioTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .map { id =>
        val rate = (id % 4) match {
          case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
        }
        val channels = 1 + ((id / 7) % 2).toInt
        val bits = if ((id / 3) % 2 == 0) 8 else 16
        val nSamples = 64 + (id % 128).toInt
        MediaRecord(id, wavBytes(rate, channels, bits, nSamples), "audio/wav")
      }
  }

  /** Parsed per-document audio features; duration in exact integer
    * microseconds (`n_samples · 1e6 div rate` — floor division agrees
    * across engines). */
  final case class AudioFeatures(
      doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_samples: Long, byte_len: Long, duration_us: Long)

  /** The audio decode path — same mapPartitions batch contract as
    * [[decodeFeatures]] (per-partition codec init seam; payload dropped
    * at decode so shuffles carry only small scalar rows). */
  def decodeAudio(ds: Dataset[MediaRecord]): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        wavDecode(r.media).map { m =>
          AudioFeatures(r.doc_id, m.rate, m.channels, m.bits,
            m.nSamples.toLong, r.media.length.toLong,
            m.nSamples.toLong * 1000000L / m.rate)
        }
      }
    }
  }

  /** m04: per-(rate, channels) audio metadata summary over REAL WAV
    * binaries — generate ([[audioTable]]), walk the RIFF chunks back
    * out ([[decodeAudio]] → [[wavDecode]]), aggregate. Streams/codec
    * checks at 100 TB: one scan, map-side decode, small-key agg. */
  def audioMetaSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeAudio(audioTable(spark, sfDir))
      .groupBy($"sample_rate", $"channels")
      .agg(count(lit(1)).as("media_count"),
        sum($"byte_len").cast(LongType).as("total_bytes"),
        sum($"n_samples").cast(LongType).as("total_samples"),
        sum($"duration_us").cast(LongType).as("total_duration_us"))
  }

  /** The arithmetic twin of [[audioTable]] + [[wavDecode]]: every
    * parameter replays the doc_id derivation; byte length is the
    * 44-byte canonical header plus the block-aligned payload. */
  val audioMetaSummaryOracle: String =
    s"""WITH wav AS (
       |  SELECT doc_id,
       |         CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
       |              WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
       |         cast(1 + (doc_id // 7) % 2 AS INT) AS channels,
       |         CASE WHEN (doc_id // 3) % 2 = 0 THEN 8 ELSE 16 END AS bits,
       |         64 + doc_id % 128 AS n_samples
       |  FROM documents),
       |f AS (SELECT *, channels * (bits // 8) AS block_align FROM wav)
       |SELECT cast(sample_rate AS INT) AS sample_rate, channels,
       |       count(*) AS media_count,
       |       cast(sum(44 + n_samples * block_align) AS BIGINT) AS total_bytes,
       |       cast(sum(n_samples) AS BIGINT) AS total_samples,
       |       cast(sum((n_samples * 1000000) // sample_rate) AS BIGINT)
       |         AS total_duration_us
       |FROM f GROUP BY 1, 2""".stripMargin

  // ===== m08: REAL PCM decode — the audio twin of m06's pixel tier
  // (m04 stops at container metadata; this reads the actual samples) =====

  /** m08's deterministic 16-bit sample: a (doc, channel, frame)-keyed
    * signal in [−2048, 2047] — all operands non-negative before the
    * final shift, so both engines' mod conventions agree. */
  def pcmSample(id: Long, ch: Int, f: Int): Int =
    ((id * 31 + ch.toLong * 17 + f.toLong * 7) % 4096).toInt - 2048

  /** A REAL 16-bit PCM WAV carrying [[pcmSample]]'s signal as
    * interleaved little-endian frames — same canonical 44-byte layout
    * as [[wavBytes]], but the payload is actual audio data the decode
    * side must parse back out byte-for-byte. */
  def pcmWavBytes(rate: Int, channels: Int, nSamples: Int, id: Long): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >>> 8) & 0xff).toByte)
    def le32(v: Int) = Array(
      (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    val blockAlign = channels * 2
    val dataLen = nSamples * blockAlign
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out ++= "RIFF".getBytes("US-ASCII")
    out ++= le32(36 + dataLen)
    out ++= "WAVE".getBytes("US-ASCII")
    out ++= "fmt ".getBytes("US-ASCII")
    out ++= le32(16)
    out ++= le16(1) // PCM
    out ++= le16(channels)
    out ++= le32(rate)
    out ++= le32(rate * blockAlign)
    out ++= le16(blockAlign)
    out ++= le16(16)
    out ++= "data".getBytes("US-ASCII")
    out ++= le32(dataLen)
    var f = 0
    while (f < nSamples) {
      var c = 0
      while (c < channels) {
        out ++= le16(pcmSample(id, c, f) & 0xffff)
        c += 1
      }
      f += 1
    }
    out.toArray
  }

  /** m08's media fixture: real PCM WAVs with m04's container geometry
    * (rate by id%4, channels by id div 7, frames 64 + id%128) but
    * bits fixed at 16 and [[pcmSample]] signal in the data chunk. */
  def audioPcmTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .map { id =>
        val rate = (id % 4) match {
          case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
        }
        val channels = 1 + ((id / 7) % 2).toInt
        val nSamples = 64 + (id % 128).toInt
        MediaRecord(id, pcmWavBytes(rate, channels, nSamples, id),
          "audio/wav")
      }
  }

  /** RIFF walk to the PCM payload: like [[wavDecode]] but also returns
    * the data chunk's byte OFFSET so a caller can read the samples.
    * 16-bit PCM only (the sample loop below is LE16); the same
    * negative-chunk-length guard applies. */
  def wavPcm16(b: Array[Byte]): Option[(WavMeta, Int)] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    try {
      if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Int, Int, Int)] = None
      var dataAt = -1
      var dataLen = -1
      while (i + 8 <= b.length && (fmt.isEmpty || dataAt < 0)) {
        val (id, len) = (tag(i), le32(i + 4))
        if (len < 0) return None
        if (id == "fmt ") {
          if (le16(i + 8) != 1) return None
          fmt = Some((le32(i + 12), le16(i + 10), le16(i + 22)))
        } else if (id == "data") { dataAt = i + 8; dataLen = len }
        i += 8 + len + (len & 1)
      }
      fmt match {
        case Some((rate, ch, 16))
            if dataAt >= 0 && ch > 0 && dataLen % (ch * 2) == 0 &&
              dataAt + dataLen <= b.length =>
          Some((WavMeta(rate, ch, 16, dataLen / (ch * 2)), dataAt))
        case _ => None
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** Exact integer per-(doc, channel) PCM statistics from REAL decoded
    * sample bytes. */
  final case class PcmChannelStats(
      doc_id: Long, sample_rate: Int, channels: Int, ch: Int,
      n_frames: Long, sum_s: Long, sum_sq: Long, min_s: Int, max_s: Int)

  /** Decode actual interleaved LE16 samples ([[wavPcm16]]) and fold
    * per-channel exact integer stats — sums and sums of squares, never
    * a float mean, so the stage stays driver-hashable. Binary dropped
    * at decode; shuffles carry ≤2 small rows per document. */
  def decodePcmStats(ds: Dataset[MediaRecord]): Dataset[PcmChannelStats] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        wavPcm16(r.media).toSeq.flatMap { case (m, at) =>
          val n = m.nSamples
          (0 until m.channels).map { c =>
            var f = 0
            var s = 0L
            var sq = 0L
            var mn = Int.MaxValue
            var mx = Int.MinValue
            while (f < n) {
              val o = at + (f * m.channels + c) * 2
              val v = ((r.media(o) & 0xff) |
                (r.media(o + 1) << 8)).toShort.toInt
              s += v; sq += v.toLong * v
              if (v < mn) mn = v
              if (v > mx) mx = v
              f += 1
            }
            PcmChannelStats(r.doc_id, m.rate, m.channels, c,
              n.toLong, s, sq, mn, mx)
          }
        }
      }
    }
  }

  /** m08: PCM ENERGY SUMMARY over REAL decoded samples — generate
    * ([[audioPcmTable]], real WAV encode), read the actual interleaved
    * sample bytes back out ([[decodePcmStats]]), aggregate exact
    * integer energy per (rate, channel-count). Any wrong decoded
    * sample anywhere shifts a sum — the oracle replays the generator
    * arithmetic per (doc, channel, frame) and never parses a WAV
    * (the m06 convention, pointed at audio).
    */
  def audioEnergySummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = graft.models.Shared
      .materialized("pcm_media", spark, sfDir) {
        audioPcmTable(spark, sfDir).toDF()
      }.as[MediaRecord]
    decodePcmStats(media)
      .groupBy($"sample_rate", $"channels")
      .agg(countDistinct($"doc_id").as("media_count"),
        sum($"n_frames").as("total_frames"),
        sum($"sum_s").as("sum_s"),
        sum($"sum_sq").as("sum_sq"),
        min($"min_s").cast(LongType).as("min_s"),
        max($"max_s").cast(LongType).as("max_s"))
  }

  /** The arithmetic twin of [[audioPcmTable]] + [[decodePcmStats]]:
    * every sample value replays the (doc, channel, frame) derivation;
    * DuckDB never reads a WAV byte. */
  val audioEnergySummaryOracle: String =
    """WITH wav AS (
      |  SELECT doc_id,
      |         CASE doc_id % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
      |              WHEN 2 THEN 22050 ELSE 44100 END AS sample_rate,
      |         cast(1 + (doc_id // 7) % 2 AS INT) AS channels,
      |         64 + doc_id % 128 AS n_samples
      |  FROM documents),
      |fr AS (SELECT doc_id, sample_rate, channels, n_samples,
      |              unnest(range(n_samples)) AS f
      |       FROM wav),
      |sm AS (SELECT doc_id, sample_rate, channels, f,
      |              unnest(range(channels)) AS c
      |       FROM fr),
      |v AS (SELECT doc_id, sample_rate, channels,
      |             ((doc_id * 31 + c * 17 + f * 7) % 4096) - 2048 AS s
      |      FROM sm)
      |SELECT cast(sample_rate AS INT) AS sample_rate, channels,
      |       count(DISTINCT doc_id) AS media_count,
      |       count(*) AS total_frames,
      |       cast(sum(s) AS BIGINT) AS sum_s,
      |       cast(sum(s * s) AS BIGINT) AS sum_sq,
      |       cast(min(s) AS BIGINT) AS min_s,
      |       cast(max(s) AS BIGINT) AS max_s
      |FROM v GROUP BY 1, 2""".stripMargin

  // ===== m05: video (ISO-BMFF / MP4) — the fourth modality =====

  /** Fixed generated-box sizes (the oracle's byte accounting): ftyp
    * carries one compatible brand; mvhd/tkhd are version-0. */
  val FtypLen = 20 // 8 hdr + brand(4) + minor(4) + 1 compatible(4)
  val MvhdLen = 108 // 8 hdr + 100 version-0 payload
  val TrakLen = 100 // 8 trak hdr + (8 tkhd hdr + 84 version-0 payload)

  private def be32(v: Int): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    be32(payload.length + 8) ++ typ.getBytes("US-ASCII") ++ payload

  /** A minimal ISO-BMFF (MP4-family) skeleton: `ftyp` with the major
    * brand, `moov` holding a version-0 `mvhd` (timescale + duration in
    * media units) and one `trak`/`tkhd` per track, then an `mdat`
    * payload — the box grammar every real demuxer walks first.
    * Constant size per track count: [[FtypLen]] + 8 + [[MvhdLen]] +
    * tracks·[[TrakLen]] + 8 + mdatLen. */
  def mp4Bytes(brand: String, timescale: Int, durationUnits: Int,
      nTracks: Int, mdatLen: Int): Array[Byte] = {
    require(brand.length == 4)
    val ftyp = box("ftyp",
      brand.getBytes("US-ASCII") ++ be32(0) ++
        "isom".getBytes("US-ASCII"))
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ // ver/flags, created, modified
        be32(timescale) ++ be32(durationUnits) ++
        be32(0x00010000) ++ // rate 1.0
        Array.fill[Byte](2)(0) ++ // volume
        Array.fill[Byte](10)(0) ++ // reserved
        Array.fill[Byte](36)(0) ++ // matrix
        Array.fill[Byte](24)(0) ++ // predefined
        be32(nTracks + 1)) // next track id
    val traks = (1 to nTracks).map { tid =>
      box("trak", box("tkhd",
        be32(0) ++ be32(0) ++ be32(0) ++ // ver/flags, created, modified
          be32(tid) ++ be32(0) ++ be32(durationUnits) ++
          Array.fill[Byte](8)(0) ++ // reserved
          Array.fill[Byte](2)(0) ++ Array.fill[Byte](2)(0) ++ // layer, group
          Array.fill[Byte](2)(0) ++ Array.fill[Byte](2)(0) ++ // volume, rsvd
          Array.fill[Byte](36)(0) ++ // matrix
          be32(0) ++ be32(0))) // width, height (16.16)
    }
    val moov = box("moov", mvhd ++ traks.toArray.flatten)
    val mdat = box("mdat", Array.fill[Byte](mdatLen)(0))
    ftyp ++ moov ++ mdat
  }

  /** Parsed container metadata; duration in exact integer milliseconds
    * (`units · 1000 div timescale`). */
  final case class Mp4Meta(
      brand: String, timescale: Int, durationUnits: Int, nTracks: Int)

  /** Pure-JVM ISO-BMFF box walk (the video sibling of [[wavDecode]]):
    * verify the leading `ftyp`, then walk sibling boxes by their size
    * prefixes; inside `moov`, read the version-0 `mvhd` (timescale,
    * duration) and count `trak` children, skipping any other box (real
    * files carry udta/meta/free) — sample data (`mdat`) is never read.
    * None for anything unrecognizable, truncated, or version≠0. */
  def mp4Decode(b: Array[Byte]): Option[Mp4Meta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32i(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def tag(i: Int): String = new String(b, i, 4, "US-ASCII")
    try {
      if (b.length < 16 || tag(4) != "ftyp") return None
      val brand = tag(8)
      var i = 0
      var meta: Option[(Int, Int)] = None
      var tracks = 0
      var sawMoov = false
      while (i + 8 <= b.length) {
        val (len, typ) = (be32i(i), tag(i + 4))
        if (len < 8) return None
        if (typ == "moov") {
          sawMoov = true
          var j = i + 8
          val end = i + len
          while (j + 8 <= end) {
            val (clen, ctyp) = (be32i(j), tag(j + 4))
            if (clen < 8) return None
            if (ctyp == "mvhd") {
              if (u8(j + 8) != 0) return None // version-0 only
              meta = Some((be32i(j + 20), be32i(j + 24)))
            } else if (ctyp == "trak") tracks += 1
            j += clen
          }
        }
        i += len
      }
      meta.collect {
        case (ts, dur) if sawMoov && ts > 0 =>
          Mp4Meta(brand, ts, dur, tracks)
      }
    } catch { case _: IndexOutOfBoundsException => None }
  }

  /** m05's media table: one REAL MP4 skeleton per document, every
    * parameter from doc_id ALONE — `timescale ∈ {600, 1000, 90000,
    * 48000}` by id%4, `duration_units = 1000 + id%9000`, `tracks =
    * 1 + id%3`, `brand ∈ {isom, mp42}` by (id div 5)%2, `mdat =
    * id%200` bytes (the m01/m02/m04 pattern). */
  def videoTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .map { id =>
        val timescale = (id % 4) match {
          case 0 => 600; case 1 => 1000; case 2 => 90000; case _ => 48000
        }
        val brand = if ((id / 5) % 2 == 0) "isom" else "mp42"
        MediaRecord(id,
          mp4Bytes(brand, timescale, (1000 + id % 9000).toInt,
            (1 + id % 3).toInt, (id % 200).toInt),
          "video/mp4")
      }
  }

  final case class VideoFeatures(
      doc_id: Long, brand: String, n_tracks: Int, byte_len: Long,
      duration_ms: Long)

  /** The video decode path — same mapPartitions batch contract as
    * [[decodeFeatures]]/[[decodeAudio]]. */
  def decodeVideo(ds: Dataset[MediaRecord]): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        mp4Decode(r.media).map { m =>
          VideoFeatures(r.doc_id, m.brand, m.nTracks, r.media.length.toLong,
            m.durationUnits.toLong * 1000L / m.timescale)
        }
      }
    }
  }

  /** m05: per-(brand, tracks) video container summary over REAL
    * ISO-BMFF skeletons — generate ([[videoTable]]), walk the boxes
    * back out ([[decodeVideo]] → [[mp4Decode]]), aggregate. */
  def videoMetaSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    decodeVideo(videoTable(spark, sfDir))
      .groupBy($"brand", $"n_tracks")
      .agg(count(lit(1)).as("media_count"),
        sum($"byte_len").cast(LongType).as("total_bytes"),
        sum($"duration_ms").cast(LongType).as("total_duration_ms"))
  }

  // ===== m06: REAL pixel decode (javax.imageio) — decoded rasters, not
  // header metadata =====

  /** m06's media table: one REAL pixel-bearing PNG per document,
    * encoded by the JDK's own ImageIO PNG writer. Dimensions and every
    * pixel derive from doc_id ALONE — `w = 8 + id%16`,
    * `h = 8 + (id div 3)%16`, and pixel (x, y) is
    * `r = (id + 3x + 7y) % 256`, `g = (2id + 5x + y) % 256`,
    * `b = (id + x·y) % 256` — so the DuckDB oracle recomputes every
    * pixel arithmetically while the Spark side round-trips the actual
    * bytes through a real codec (encode here, decode in
    * [[decodePixelFeatures]]). PNG is lossless, so the decoded raster
    * is bit-identical to the generator arithmetic — the property that
    * makes a pixel-level stage oracle-checkable at all (a JPEG twin
    * exists in MultimodalSpec as an approximate round-trip; lossy
    * codecs can't be driver-hashed).
    */
  def pixelImageTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        // per-partition codec amortization: ImageIO scans its writer
        // registry once per partition, not once per image
        val writerReady = javax.imageio.ImageIO.getImageWritersByFormatName("png").hasNext
        require(writerReady, "JDK PNG writer missing")
        it.map { id =>
          val w = 8 + (id % 16).toInt
          val h = 8 + ((id / 3) % 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((id + 3L * x + 7L * y) % 256).toInt
              val g = ((2L * id + 5L * x + y) % 256).toInt
              val b = ((id + x.toLong * y) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          MediaRecord(id, baos.toByteArray, "image/png")
        }
      }
  }

  /** One average-pool cell of a decoded raster: exact integer channel
    * sums over the cell's pixels (sums, not means — integer division
    * conventions never enter the contract). */
  final case class PixelPoolCell(
      doc_id: Long, width: Int, height: Int, cell_y: Int, cell_x: Int,
      px_count: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL pixel decode + 4×4 average-pool grid via mapPartitions — the
    * feature-extract stage a vision pipeline runs after decode, on
    * actual rasters ([[javax.imageio.ImageIO]]`.read`, the JDK's PNG/
    * JPEG/GIF decoders; no new dependency). Pixel (x, y) pools into
    * cell `((y·4) div h, (x·4) div w)` — the floor-partition both
    * engines express identically. Payloads that fail to decode are
    * dropped (a production pipeline quarantines them).
    *
    * Scale: decode is embarrassingly parallel and codec init amortizes
    * per partition (the mapInPandas batch contract); the binary is
    * dropped at decode, so shuffles carry only 16 small integer rows
    * per document.
    */
  def decodePixelFeatures(ds: Dataset[MediaRecord]): Dataset[PixelPoolCell] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { rec =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(rec.media))
        if (img == null) Iterator.empty
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val count = Array.ofDim[Long](4, 4)
          val sr = Array.ofDim[Long](4, 4)
          val sg = Array.ofDim[Long](4, 4)
          val sb = Array.ofDim[Long](4, 4)
          var y = 0
          while (y < h) {
            val cy = y * 4 / h
            var x = 0
            while (x < w) {
              val cx = x * 4 / w
              val rgb = img.getRGB(x, y)
              count(cy)(cx) += 1
              sr(cy)(cx) += (rgb >> 16) & 0xff
              sg(cy)(cx) += (rgb >> 8) & 0xff
              sb(cy)(cx) += rgb & 0xff
              x += 1
            }
            y += 1
          }
          for (cy <- 0 until 4; cx <- 0 until 4 if count(cy)(cx) > 0)
            yield PixelPoolCell(rec.doc_id, w, h, cy, cx,
              count(cy)(cx), sr(cy)(cx), sg(cy)(cx), sb(cy)(cx))
        }
      }
    }
  }

  /** m06: corpus-wide pooled-pixel summary over REAL decoded rasters —
    * generate ([[pixelImageTable]], real ImageIO PNG encode), decode
    * the actual pixels back out ([[decodePixelFeatures]] → ImageIO
    * read), average-pool 4×4, aggregate per grid cell. Any wrong pixel
    * anywhere in the corpus shifts a sum — the oracle (which replays
    * the generator arithmetic per pixel, never parsing a PNG) catches
    * single-channel single-pixel errors.
    */
  def pixelPoolSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // media arrives STORED in production — materialize the generated
    // binaries once per session so the steady state measures the
    // decode operator, not the fixture's encode
    val media = graft.models.Shared
      .materialized("pixel_media", spark, sfDir) {
        pixelImageTable(spark, sfDir).toDF()
      }.as[MediaRecord]
    decodePixelFeatures(media)
      .groupBy($"cell_y".cast(LongType).as("cell_y"),
        $"cell_x".cast(LongType).as("cell_x"))
      .agg(count(lit(1)).as("media_count"),
        sum($"px_count").as("px_count"),
        sum($"sum_r").as("sum_r"),
        sum($"sum_g").as("sum_g"),
        sum($"sum_b").as("sum_b"))
  }

  /** The arithmetic twin of [[pixelImageTable]] + [[decodePixelFeatures]]:
    * every pixel value replays the doc_id derivation (pixel index
    * p → (x, y) = (p % w, p div w)); DuckDB never decodes a PNG. */
  val pixelPoolSummaryOracle: String =
    """WITH img AS (
      |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 3) % 16 AS h
      |  FROM documents),
      |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM img),
      |vals AS (
      |  SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px),
      |pooled AS (
      |  SELECT doc_id,
      |         (y * 4) // h AS cell_y, (x * 4) // w AS cell_x,
      |         (doc_id + 3 * x + 7 * y) % 256 AS r,
      |         (2 * doc_id + 5 * x + y) % 256 AS g,
      |         (doc_id + x * y) % 256 AS b
      |  FROM vals)
      |SELECT cast(cell_y AS BIGINT) AS cell_y,
      |       cast(cell_x AS BIGINT) AS cell_x,
      |       count(DISTINCT doc_id) AS media_count,
      |       count(*) AS px_count,
      |       cast(sum(r) AS BIGINT) AS sum_r,
      |       cast(sum(g) AS BIGINT) AS sum_g,
      |       cast(sum(b) AS BIGINT) AS sum_b
      |FROM pooled GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // m07: perceptual-hash image dedup
  // ------------------------------------------------------------------

  /** m07's media fixture: image CONTENT keyed on `ck = doc_id % 97`,
    * not on doc_id — so ~|docs|/97 documents carry pixel-identical
    * images under different doc_ids, the situation perceptual dedup
    * exists for (the same photo re-uploaded across a crawl). Size and
    * pixels replay [[pixelImageTable]]'s arithmetic over ck; PNG is
    * lossless, so decoded rasters are bit-identical to the generator
    * and the stage stays oracle-checkable. Robustness to LOSSY
    * re-encodes (the JPEG-ized copy of a PNG) is pinned in
    * MultimodalSpec — a lossy codec's pixels can't be driver-hashed.
    */
  def phashImageTable(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        val writerReady = javax.imageio.ImageIO.getImageWritersByFormatName("png").hasNext
        require(writerReady, "JDK PNG writer missing")
        it.map { id =>
          val ck = id % 97
          val w = 8 + (ck % 16).toInt
          val h = 8 + ((ck / 3) % 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((ck + 3L * x + 7L * y) % 256).toInt
              val g = ((2L * ck + 5L * x + y) % 256).toInt
              val b = ((ck + x.toLong * y) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val baos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", baos)
          MediaRecord(id, baos.toByteArray, "image/png")
        }
      }
  }

  /** 16-bit average-hash (aHash) per document over REAL decoded
    * rasters: decode ([[decodePixelFeatures]] — ImageIO, any format the
    * JDK reads), 4×4 average-pool, then bit(cy,cx) = 1 iff the cell's
    * mean luminance exceeds the image's global mean. The comparison is
    * the EXACT integer cross-multiplication `cell_lum · total_px >
    * total_lum · cell_px` — no division, no float, engine-independent
    * (the m06 convention). Luminance is the unweighted r+g+b sum, kept
    * integer for the same reason.
    *
    * Scale: decode is embarrassingly parallel and drops the binary
    * immediately; the per-doc window runs over dense 16-row partitions
    * hash-distributed on doc_id. One 16-bit value per image leaves the
    * stage — the whole dedup index for a billion images is 8 GB.
    */
  def perceptualHashes(media: Dataset[MediaRecord]): DataFrame = {
    import media.sparkSession.implicits._
    val cells = decodePixelFeatures(media)
      .select($"doc_id",
        ($"cell_y" * 4 + $"cell_x").cast(IntegerType).as("bit_idx"),
        ($"sum_r" + $"sum_g" + $"sum_b").as("lum"), $"px_count")
    val wdoc = org.apache.spark.sql.expressions.Window.partitionBy($"doc_id")
    cells
      .withColumn("tot_lum", sum($"lum").over(wdoc))
      .withColumn("tot_px", sum($"px_count").over(wdoc))
      .groupBy($"doc_id")
      .agg(sum(expr(
        "CASE WHEN lum * tot_px > tot_lum * px_count" +
          " THEN shiftleft(1L, bit_idx) ELSE 0L END")).as("ahash"))
  }

  /** Single-pass pure-JVM twin of [[perceptualHashes]]: same decoded
    * pixels (ImageIO), same exact-integer pooling and cross-multiplied
    * bit rule, folded imperatively so it lifts to a STREAMING Dataset
    * (the DataFrame form needs a per-doc window, which streams can't
    * run). MultimodalSpec pins hash equality between the two paths
    * over the m07 fixture. */
  def ahash16(bytes: Array[Byte]): Option[Long] = ahashGrid(bytes, 4)

  /** 64-bit aHash — the SAME pooling/bit rule on an 8×8 grid. The
    * 16-bit hash is demo-tight (65k values: band buckets stay readable
    * at sf fixtures); at billion-image scale 2¹⁶ values would make
    * every near-tier bucket corpus-sized, so the production path keys
    * on this widening — denser pixel evidence per bit boundary, 2⁶⁴
    * value space, sparser buckets. MultimodalSpec pins the sparsity
    * contrast on a synthetic fixture and the dedup plan's behavior on
    * 64-bit keys. */
  def ahash64(bytes: Array[Byte]): Option[Long] = ahashGrid(bytes, 8)

  /** Shared g×g average-hash fold: integer luminance sums per cell,
    * bit(cell) = 1 iff `cell_lum · total_px > total_lum · cell_px`
    * (exact cross-multiplication — no division, no float). g=4
    * reproduces [[ahash16]] bit-for-bit (spec-pinned against the
    * DataFrame path); g=8 is [[ahash64]]. */
  private def ahashGrid(bytes: Array[Byte], g: Int): Option[Long] = {
    require(g * g <= 64, s"ahash grid $g x $g exceeds 64 bits")
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val lum = Array.ofDim[Long](g * g)
      val cnt = Array.ofDim[Long](g * g)
      var y = 0
      while (y < h) {
        val cy = y * g / h
        var x = 0
        while (x < w) {
          val cell = cy * g + x * g / w
          val rgb = img.getRGB(x, y)
          lum(cell) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
            (rgb & 0xff)
          cnt(cell) += 1
          x += 1
        }
        y += 1
      }
      val totLum = lum.sum
      val totPx = cnt.sum
      var hash = 0L
      var i = 0
      while (i < g * g) {
        if (cnt(i) > 0 && lum(i) * totPx > totLum * cnt(i))
          hash |= 1L << i
        i += 1
      }
      Some(hash)
    }
  }

  /** m07: PERCEPTUAL-HASH IMAGE DEDUP (beyond-reference) — the
    * content-level image twin of d01+d03: re-encoded or re-uploaded
    * copies of the same picture are invisible to byte-level dedup, so
    * dedup the 16-bit aHash of the decoded raster instead.
    *
    *  1. exact tier (d01 idiom): groupBy ahash — every hash carried by
    *     more than one document is a perceptual-duplicate group; one
    *     `(h, h, 0, n, n)` row per group.
    *  2. near tier (d03/d04 banded idiom): split the hash into 4 bands
    *     of 4 bits; Hamming ≤ 2 forces ≥ 2 equal bands (pigeonhole),
    *     so an equi-self-join on (band, band_value) finds every
    *     candidate without an all-pairs compare; exact Hamming via
    *     `bit_count(xor)` keeps pairs ≤ 2 apart, one
    *     `(h_a, h_b, hamming, docs_a, docs_b)` row each.
    *
    * Scale: the banded join is quadratic only within a (band, value)
    * bucket of the DISTINCT-hash table — corpus size never enters the
    * pair volume, and the hash table itself is content-cardinality
    * sized. The two count joins broadcast that same small table.
    */
  def phashImageDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the per-doc HASH table is what production stores (the scaladoc's
    // "one 16-bit value per image leaves the stage" — an ingest-time
    // extraction, exactly like m09's video_frame_hashes and m10's
    // audio_fp_energies); materializing hashes instead of the payload
    // bytes means the dedup tiers never re-decode rasters, and every
    // branch below (groups / bands / both count joins) reads the tiny
    // parquet instead of re-running ImageIO per reference
    val hashes = graft.models.Shared
      .materialized("phash_hashes", spark, sfDir) {
        perceptualHashes(phashImageTable(spark, sfDir))
      }
    val groups = hashes
      .groupBy($"ahash").agg(count(lit(1)).as("n_docs"))
    val selfRows = groups.filter($"n_docs" > 1)
      .select($"ahash".as("hash_a"), $"ahash".as("hash_b"),
        lit(0L).as("hamming"), $"n_docs".as("docs_a"),
        $"n_docs".as("docs_b"))
    val bands = groups.select($"ahash",
      explode(sequence(lit(0), lit(3))).as("band"))
      .withColumn("band_val", expr("shiftright(ahash, band * 4) & 15"))
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.ahash") < col("y.ahash"))
      .select(col("x.ahash").as("hash_a"), col("y.ahash").as("hash_b"))
      .distinct()
    val near = cand
      .withColumn("hamming",
        expr("bit_count(hash_a ^ hash_b)").cast(LongType))
      .filter($"hamming" <= 2)
      .join(broadcast(groups.select($"ahash".as("hash_a"),
        $"n_docs".as("docs_a"))), Seq("hash_a"))
      .join(broadcast(groups.select($"ahash".as("hash_b"),
        $"n_docs".as("docs_b"))), Seq("hash_b"))
      .select($"hash_a", $"hash_b", $"hamming", $"docs_a", $"docs_b")
    selfRows.unionByName(near)
  }

  /** The arithmetic twin of [[phashImageDedup]]: pixels, pools, hash
    * bits, bands, and Hamming distances all replayed per DISTINCT
    * content key — DuckDB never decodes a PNG (the m06 convention). */
  val phashImageDedupOracle: String =
    """WITH ckt AS (SELECT DISTINCT doc_id % 97 AS ck FROM documents),
      |img AS (SELECT ck, 8 + ck % 16 AS w, 8 + (ck // 3) % 16 AS h FROM ckt),
      |px AS (SELECT ck, w, h, unnest(range(w * h)) AS p FROM img),
      |vals AS (SELECT ck, w, h, p % w AS x, p // w AS y FROM px),
      |cells AS (
      |  SELECT ck,
      |         ((y * 4) // h) * 4 + (x * 4) // w AS bit_idx,
      |         sum((ck + 3 * x + 7 * y) % 256 + (2 * ck + 5 * x + y) % 256
      |             + (ck + x * y) % 256) AS lum,
      |         count(*) AS pxc
      |  FROM vals GROUP BY 1, 2),
      |tot AS (SELECT ck, sum(lum) AS tl, sum(pxc) AS tp FROM cells GROUP BY 1),
      |hashes AS (
      |  SELECT c.ck,
      |         cast(sum(CASE WHEN c.lum * t.tp > t.tl * c.pxc
      |                       THEN 1 << c.bit_idx ELSE 0 END) AS BIGINT) AS ahash
      |  FROM cells c JOIN tot t USING (ck) GROUP BY 1),
      |grp AS (SELECT h.ahash, count(*) AS n_docs
      |        FROM documents d JOIN hashes h ON d.doc_id % 97 = h.ck
      |        GROUP BY 1),
      |selfrows AS (SELECT ahash AS hash_a, ahash AS hash_b,
      |                    cast(0 AS BIGINT) AS hamming,
      |                    n_docs AS docs_a, n_docs AS docs_b
      |             FROM grp WHERE n_docs > 1),
      |bands AS (SELECT ahash, b, (ahash >> (b * 4)) & 15 AS bv
      |          FROM grp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b)),
      |cand AS (SELECT DISTINCT x.ahash AS hash_a, y.ahash AS hash_b
      |         FROM bands x JOIN bands y
      |           ON x.b = y.b AND x.bv = y.bv AND x.ahash < y.ahash),
      |near AS (SELECT c.hash_a, c.hash_b,
      |                cast(bit_count(xor(c.hash_a, c.hash_b)) AS BIGINT) AS hamming,
      |                ga.n_docs AS docs_a, gb.n_docs AS docs_b
      |         FROM cand c
      |         JOIN grp ga ON c.hash_a = ga.ahash
      |         JOIN grp gb ON c.hash_b = gb.ahash
      |         WHERE bit_count(xor(c.hash_a, c.hash_b)) <= 2)
      |SELECT * FROM selfrows UNION ALL SELECT * FROM near""".stripMargin

  /** The arithmetic twin of [[videoTable]] + [[mp4Decode]]: every
    * parameter replays the doc_id derivation; byte length follows the
    * constant box-size accounting. */
  val videoMetaSummaryOracle: String =
    s"""WITH vid AS (
       |  SELECT doc_id,
       |         CASE doc_id % 4 WHEN 0 THEN 600 WHEN 1 THEN 1000
       |              WHEN 2 THEN 90000 ELSE 48000 END AS timescale,
       |         CASE WHEN (doc_id // 5) % 2 = 0 THEN 'isom'
       |              ELSE 'mp42' END AS brand,
       |         1000 + doc_id % 9000 AS duration_units,
       |         cast(1 + doc_id % 3 AS INT) AS n_tracks,
       |         doc_id % 200 AS mdat_len
       |  FROM documents)
       |SELECT brand, n_tracks,
       |       count(*) AS media_count,
       |       cast(sum($FtypLen + 8 + $MvhdLen + n_tracks * $TrakLen
       |                + 8 + mdat_len) AS BIGINT) AS total_bytes,
       |       cast(sum((duration_units * 1000) // timescale) AS BIGINT)
       |         AS total_duration_ms
       |FROM vid GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // m09: video keyframe perceptual-hash dedup — m02's frame-sampling
  // budget rule composed with m07's ahash16, so RE-ENCODED VIDEO
  // duplicates (same footage re-uploaded under a new container/bitrate)
  // are caught at the content level, the one multimodal family that
  // had no content tier before this round.
  // ------------------------------------------------------------------

  /** A sampled video keyframe: the frame index, the video's total frame
    * count, and the frame's REAL encoded raster. */
  final case class VideoFrame(
      doc_id: Long, f: Int, n_frames: Int, media: Array[Byte])

  /** m09's keyframe budget: at most this many frames are decoded per
    * video (stride = ceil(n/4) — the m02 sampling rule at video cost). */
  val VideoMaxSampled = 4

  /** m09's fixture: video CONTENT keyed on `ck = doc_id % 97` (the m07
    * convention — ~|docs|/97 documents carry frame-identical videos
    * under different doc_ids), `n_frames = 1 + ck % 12`, frame (w, h) =
    * (8 + ck%16, 8 + (ck div 3)%16), and per-frame pixels from the m07
    * formula shifted per frame index. ONLY the sampled keyframes are
    * ever rendered (the m02 discipline: the budget rule runs BEFORE the
    * expensive decode, so fan-out is a hard ≤[[VideoMaxSampled]]
    * rows/doc). The keyframe EXTRACTION step stands in for a real
    * codec's keyframe demux (no video codec ships in this container —
    * the brief's sanctioned stub); everything downstream of the frame
    * raster — ImageIO decode, pooling, hashing, the dedup joins — is
    * the real pipeline, and PNG losslessness keeps the stage
    * oracle-checkable via pixel-formula replay.
    */
  def videoKeyframeTable(spark: SparkSession, sfDir: String)
      : Dataset[VideoFrame] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .mapPartitions { it =>
        val writerReady = javax.imageio.ImageIO
          .getImageWritersByFormatName("png").hasNext
        require(writerReady, "JDK PNG writer missing")
        it.flatMap { id =>
          val ck = id % 97
          val n = 1 + (ck % 12).toInt
          val stride = (n + VideoMaxSampled - 1) / VideoMaxSampled
          val w = 8 + (ck % 16).toInt
          val h = 8 + ((ck / 3) % 16).toInt
          (0 until n by stride).map { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val r = ((ck + 3L * x + 7L * y + 11L * f) % 256).toInt
                val g = ((2L * ck + 5L * x + y + 13L * f) % 256).toInt
                val b = ((ck + x.toLong * y + 17L * f) % 256).toInt
                img.setRGB(x, y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", baos)
            VideoFrame(id, f, n, baos.toByteArray)
          }
        }
      }
  }

  /** m09: VIDEO KEYFRAME PERCEPTUAL-HASH DEDUP (beyond-reference).
    *
    *  1. per sampled keyframe: [[ahash16]] over the REAL decoded raster
    *     (binary dropped immediately — only (doc_id, f, 16-bit hash)
    *     rows leave the decode stage);
    *  2. per video: the ordered keyframe-hash sequence folds into one
    *     md5 SIGNATURE — byte-level container differences vanish, so
    *     re-encodes of the same footage collide;
    *  3. exact tier (d01 idiom): signature groups with > 1 doc;
    *  4. near tier (d03 idiom): DISTINCT signatures sharing ≥ 2
    *     keyframe-hash values — candidate pairs come from an equi-join
    *     on the hash value over the signature-grain table, never an
    *     all-pairs compare.
    *
    * Scale: fan-out is ≤[[VideoMaxSampled]] rows/doc before the decode;
    * everything after the per-doc fold is SIGNATURE-grain (content
    * cardinality, not corpus cardinality). The near-tier bucket join is
    * quadratic only within one hash value's signature list; a 16-bit
    * hash keeps this demo-tight — at billion-video scale the same plan
    * runs on [[ahash16]] widened to 64 bits (denser space, sparser
    * buckets), nothing else changes.
    */
  def videoKeyframePhash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fhashes = graft.models.Shared
      .materialized("video_frame_hashes", spark, sfDir) {
        videoKeyframeTable(spark, sfDir)
          .mapPartitions { it =>
            it.flatMap(v => ahash16(v.media).map(h => (v.doc_id, v.f, h)))
          }.toDF("doc_id", "f", "fhash")
      }
    videoSignatureDedup(fhashes)
  }

  /** Steps 2–4 of m09 parameterized on the frame-hash table
    * `(doc_id, f, fhash)` — the SAME signature-grain plan runs on
    * [[ahash16]] (the oracle-replayable demo grain) and on [[ahash64]]
    * (the billion-scale grain: wider hash, sparser near-tier buckets,
    * nothing else changes). MultimodalSpec drives the 64-bit path. */
  def videoSignatureDedup(fhashes: DataFrame): DataFrame = {
    import fhashes.sparkSession.implicits._
    val perDoc = fhashes.groupBy($"doc_id")
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct($"f", $"fhash"))),
          x => x.getField("fhash").cast(StringType)))).as("sig"))
    val sigDocs = perDoc.groupBy($"sig").agg(count(lit(1)).as("n_docs"))
    val sigHashes = fhashes.join(perDoc, Seq("doc_id"))
      .select($"sig", $"fhash").distinct()
    val sigShared = sigHashes.groupBy($"sig")
      .agg(count(lit(1)).as("n_hashes"))
    val selfRows = sigDocs.join(sigShared, Seq("sig"))
      .filter($"n_docs" > 1)
      .select($"sig".as("sig_a"), $"sig".as("sig_b"),
        $"n_hashes".as("shared_hashes"),
        $"n_docs".as("docs_a"), $"n_docs".as("docs_b"))
    val near = sigHashes.as("x").join(sigHashes.as("y"),
        col("x.fhash") === col("y.fhash") && col("x.sig") < col("y.sig"))
      .groupBy(col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .agg(count(lit(1)).as("shared_hashes"))
      .filter($"shared_hashes" >= 2)
      .join(broadcast(sigDocs.select($"sig".as("sig_a"),
        $"n_docs".as("docs_a"))), Seq("sig_a"))
      .join(broadcast(sigDocs.select($"sig".as("sig_b"),
        $"n_docs".as("docs_b"))), Seq("sig_b"))
      .select($"sig_a", $"sig_b", $"shared_hashes", $"docs_a", $"docs_b")
    selfRows.unionByName(near)
  }

  /** The arithmetic twin of [[videoKeyframePhash]]: sampled frame
    * indices, pixels, pools, hash bits, signatures, and shared-hash
    * counts all replayed per DISTINCT content key — DuckDB never
    * decodes a PNG (the m06/m07 convention). */
  val videoKeyframePhashOracle: String =
    s"""WITH ckt AS (SELECT DISTINCT doc_id % 97 AS ck FROM documents),
      |geom AS (SELECT ck, 8 + ck % 16 AS w, 8 + (ck // 3) % 16 AS h,
      |                1 + ck % 12 AS n,
      |                (1 + ck % 12 + ${VideoMaxSampled - 1}) // $VideoMaxSampled AS stride
      |         FROM ckt),
      |fr AS (SELECT ck, w, h, unnest(range(0, n, stride)) AS f FROM geom),
      |px AS (SELECT ck, f, w, h, unnest(range(w * h)) AS p FROM fr),
      |vals AS (SELECT ck, f, w, h, p % w AS x, p // w AS y FROM px),
      |cells AS (
      |  SELECT ck, f,
      |         ((y * 4) // h) * 4 + (x * 4) // w AS bit_idx,
      |         sum((ck + 3 * x + 7 * y + 11 * f) % 256
      |             + (2 * ck + 5 * x + y + 13 * f) % 256
      |             + (ck + x * y + 17 * f) % 256) AS lum,
      |         count(*) AS pxc
      |  FROM vals GROUP BY 1, 2, 3),
      |tot AS (SELECT ck, f, sum(lum) AS tl, sum(pxc) AS tp
      |        FROM cells GROUP BY 1, 2),
      |fhash AS (
      |  SELECT c.ck, c.f,
      |         cast(sum(CASE WHEN c.lum * t.tp > t.tl * c.pxc
      |                       THEN 1 << c.bit_idx ELSE 0 END) AS BIGINT) AS fh
      |  FROM cells c JOIN tot t ON c.ck = t.ck AND c.f = t.f
      |  GROUP BY 1, 2),
      |sigs AS (SELECT ck,
      |                md5(string_agg(cast(fh AS VARCHAR), ',' ORDER BY f)) AS sig
      |         FROM fhash GROUP BY 1),
      |sdocs AS (SELECT s.sig, count(*) AS n_docs
      |          FROM documents d JOIN sigs s ON d.doc_id % 97 = s.ck
      |          GROUP BY 1),
      |sh AS (SELECT DISTINCT s.sig, f.fh
      |       FROM sigs s JOIN fhash f ON s.ck = f.ck),
      |scnt AS (SELECT sig, count(*) AS n_hashes FROM sh GROUP BY 1),
      |selfrows AS (SELECT d.sig AS sig_a, d.sig AS sig_b,
      |                    c.n_hashes AS shared_hashes,
      |                    d.n_docs AS docs_a, d.n_docs AS docs_b
      |             FROM sdocs d JOIN scnt c USING (sig)
      |             WHERE d.n_docs > 1),
      |near AS (SELECT x.sig AS sig_a, y.sig AS sig_b,
      |                count(*) AS shared_hashes
      |         FROM sh x JOIN sh y ON x.fh = y.fh AND x.sig < y.sig
      |         GROUP BY 1, 2
      |         HAVING count(*) >= 2)
      |SELECT * FROM selfrows
      |UNION ALL
      |SELECT n.sig_a, n.sig_b, n.shared_hashes,
      |       ga.n_docs AS docs_a, gb.n_docs AS docs_b
      |FROM near n
      |JOIN sdocs ga ON n.sig_a = ga.sig
      |JOIN sdocs gb ON n.sig_b = gb.sig""".stripMargin

  // ------------------------------------------------------------------
  // m10: audio fingerprint dedup — the content tier for the LAST
  // modality without one (text d01–d11, image m07, video m09): m08's
  // real PCM decode composed with a chromaprint-style energy-delta
  // fingerprint, so RE-CONTAINERED copies of the same recording (same
  // samples under a different doc_id / container shell) collide at the
  // content level where byte dedup sees nothing.
  // ------------------------------------------------------------------

  /** Frames per fingerprint energy window. */
  val AudioFpWindow = 8

  /** Energy-delta bits per fingerprint block (the near-tier join
    * grain). */
  val AudioFpBlock = 4

  /** m10's fixture: audio CONTENT keyed on `ck = doc_id % 97` (the
    * m07/m09 convention — ~|docs|/97 documents carry sample-identical
    * recordings under different doc_ids). Geometry and signal both
    * derive from ck (m08's rate/channel/length rules, [[pcmSample]]
    * keyed on ck), so equal content keys produce byte-identical REAL
    * WAVs and distinct keys differ in nearly every sample. */
  def audioContentTable(spark: SparkSession, sfDir: String)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    graft.catalog.Tables.documents(spark, sfDir)
      .select($"doc_id").as[Long]
      .map { id =>
        val ck = id % 97
        val rate = (ck % 4) match {
          case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
        }
        val channels = 1 + ((ck / 7) % 2).toInt
        val nSamples = 64 + (ck % 128).toInt
        MediaRecord(id, pcmWavBytes(rate, channels, nSamples, ck),
          "audio/wav")
      }
  }

  /** Per-doc mono window energies decoded from REAL WAV bytes: the
    * interleaved LE16 samples fold into exact integer Σs² per
    * [[AudioFpWindow]]-frame window across all channels (trailing
    * partial window included — deterministic). Binary dropped at
    * decode; only (long, int, long) rows leave the stage. */
  def windowEnergies(ds: Dataset[MediaRecord]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.flatMap { r =>
        wavPcm16(r.media).toSeq.flatMap { case (m, at) =>
          val nWin = (m.nSamples + AudioFpWindow - 1) / AudioFpWindow
          (0 until nWin).map { w =>
            var e = 0L
            var f = w * AudioFpWindow
            val end = math.min((w + 1) * AudioFpWindow, m.nSamples)
            while (f < end) {
              var c = 0
              while (c < m.channels) {
                val o = at + (f * m.channels + c) * 2
                val v = ((r.media(o) & 0xff) |
                  (r.media(o + 1) << 8)).toShort.toInt
                e += v.toLong * v
                c += 1
              }
              f += 1
            }
            (r.doc_id, w, e)
          }
        }
      }
    }.toDF("doc_id", "w", "energy")
  }

  /** m10: AUDIO FINGERPRINT DEDUP (beyond-reference).
    *
    *  1. decode the REAL interleaved PCM and fold exact integer mono
    *     window energies ([[windowEnergies]] — the m08 decode path at
    *     window grain);
    *  2. fingerprint = the SIGN of consecutive energy deltas (the
    *     chromaprint/shazam-family primitive in its exact-integer,
    *     oracle-replayable form: `bit_j = E_{j+1} > E_j`), folded into
    *     [[AudioFpBlock]]-bit blocks;
    *  3. per doc: the ordered block-value sequence md5s into one
    *     SIGNATURE — container/byte differences vanish, identical
    *     recordings collide (m09's signature idiom);
    *  4. exact tier: signature groups with > 1 doc; near tier:
    *     DISTINCT signatures sharing ≥ 2 positional (block, value)
    *     pairs via an equi-join over the signature-grain table —
    *     never all-pairs.
    *
    * Scale: decode is embarrassingly parallel and drops the binary
    * immediately; the delta window is doc-keyed (doc-bounded
    * partitions, never a content hash); everything after the per-doc
    * fold is SIGNATURE-grain. The near-tier join is quadratic only
    * within one (block, value) bucket of the distinct-signature table;
    * [[AudioFpBlock]]=4-bit blocks keep the demo fixture readable — at
    * billion-recording scale the same plan runs with wider blocks
    * (denser value space, sparser buckets), the m07/m09 widening story.
    */
  /** Fingerprint blocks `(doc_id, b, bv)` of a window-energy frame:
    * delta bits over a doc-keyed window (doc-bounded partitions, never
    * a content hash), packed [[AudioFpBlock]] bits per block. */
  private[graft] def fingerprintBlocks(en: DataFrame): DataFrame = {
    import en.sparkSession.implicits._
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"w")
    en
      .withColumn("next_e", lead($"energy", 1).over(wd))
      .filter($"next_e".isNotNull)
      .select($"doc_id", $"w".as("j"),
        when($"next_e" > $"energy", 1L).otherwise(0L).as("bit"))
      .groupBy($"doc_id", expr(s"j div $AudioFpBlock").as("b"))
      .agg(sum(expr(s"shiftleft(bit, j % $AudioFpBlock)")).as("bv"))
  }

  /** Per-doc signature `(doc_id, sig)` of a block frame — md5 of the
    * block-ordered value sequence (the m09 signature idiom). */
  def audioSignatures(blocks: DataFrame): DataFrame = {
    import blocks.sparkSession.implicits._
    blocks.groupBy($"doc_id")
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct($"b", $"bv"))),
          x => x.getField("bv").cast(StringType)))).as("sig"))
  }

  /** Single-pass pure-JVM twin of the decode→energies→bits→blocks→md5
    * chain: the whole signature computed in-row so it lifts to a
    * STREAMING Dataset (the DataFrame form needs a per-doc window,
    * which streams can't run — the `ahash16` precedent, pointed at
    * audio). MultimodalSpec pins signature equality between the two
    * paths over the m10 fixture. */
  def audioFingerprint(bytes: Array[Byte]): Option[String] =
    wavPcm16(bytes).flatMap { case (m, at) =>
      val nWin = (m.nSamples + AudioFpWindow - 1) / AudioFpWindow
      if (nWin < 2) None
      else {
        val e = Array.ofDim[Long](nWin)
        var f = 0
        while (f < m.nSamples) {
          var c = 0
          while (c < m.channels) {
            val o = at + (f * m.channels + c) * 2
            val v = ((bytes(o) & 0xff) | (bytes(o + 1) << 8)).toShort.toInt
            e(f / AudioFpWindow) += v.toLong * v
            c += 1
          }
          f += 1
        }
        val nBlocks = (nWin - 1 + AudioFpBlock - 1) / AudioFpBlock
        val bv = Array.ofDim[Long](nBlocks)
        var j = 0
        while (j < nWin - 1) {
          if (e(j + 1) > e(j)) bv(j / AudioFpBlock) |= 1L << (j % AudioFpBlock)
          j += 1
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(bv.mkString(",").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        Some(hex)
      }
    }

  def audioFingerprintDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val en = graft.models.Shared
      .materialized("audio_fp_energies", spark, sfDir) {
        windowEnergies(audioContentTable(spark, sfDir))
      }
    // block frame materialized too: it feeds the signature rollup AND
    // the sig-block projection, and the near tier's self-join
    // references the latter twice — without the parquet hop each
    // reference re-runs the per-doc lead/shift window over the energy
    // table (plan-audited: the window partitions on doc_id, but four
    // re-executions of it is pure waste)
    val blocks = graft.models.Shared
      .materialized("audio_fp_blocks", spark, sfDir) {
        fingerprintBlocks(en)
      }
    val perDoc = audioSignatures(blocks)
    val sigDocs = perDoc.groupBy($"sig").agg(count(lit(1)).as("n_docs"))
    val sigBlocks = blocks.join(perDoc, Seq("doc_id"))
      .select($"sig", $"b", $"bv").distinct()
    val sigShared = sigBlocks.groupBy($"sig")
      .agg(count(lit(1)).as("n_blocks"))
    val selfRows = sigDocs.join(sigShared, Seq("sig"))
      .filter($"n_docs" > 1)
      .select($"sig".as("sig_a"), $"sig".as("sig_b"),
        $"n_blocks".as("shared_blocks"),
        $"n_docs".as("docs_a"), $"n_docs".as("docs_b"))
    val near = sigBlocks.as("x").join(sigBlocks.as("y"),
        col("x.b") === col("y.b") && col("x.bv") === col("y.bv") &&
          col("x.sig") < col("y.sig"))
      .groupBy(col("x.sig").as("sig_a"), col("y.sig").as("sig_b"))
      .agg(count(lit(1)).as("shared_blocks"))
      .filter($"shared_blocks" >= 2)
      .join(broadcast(sigDocs.select($"sig".as("sig_a"),
        $"n_docs".as("docs_a"))), Seq("sig_a"))
      .join(broadcast(sigDocs.select($"sig".as("sig_b"),
        $"n_docs".as("docs_b"))), Seq("sig_b"))
      .select($"sig_a", $"sig_b", $"shared_blocks", $"docs_a", $"docs_b")
    selfRows.unionByName(near)
  }

  /** The arithmetic twin of [[audioFingerprintDedup]]: samples, window
    * energies, delta bits, blocks, signatures and shared-block counts
    * all replayed per DISTINCT content key — DuckDB never reads a WAV
    * byte (the m06/m08/m09 convention). */
  val audioFingerprintDedupOracle: String =
    s"""WITH ckt AS (SELECT DISTINCT doc_id % 97 AS ck FROM documents),
      |geom AS (SELECT ck, cast(1 + (ck // 7) % 2 AS INT) AS channels,
      |                64 + ck % 128 AS n FROM ckt),
      |fr AS (SELECT ck, channels, unnest(range(n)) AS f FROM geom),
      |sam AS (SELECT ck, f, unnest(range(channels)) AS c FROM fr),
      |vals AS (SELECT ck, f, c,
      |                (ck * 31 + c * 17 + f * 7) % 4096 - 2048 AS s
      |         FROM sam),
      |wen AS (SELECT ck, f // $AudioFpWindow AS w, sum(s * s) AS energy
      |        FROM vals GROUP BY 1, 2),
      |bits AS (SELECT ck, w AS j,
      |                CASE WHEN lead(energy) OVER (PARTITION BY ck ORDER BY w)
      |                          > energy THEN 1 ELSE 0 END AS bit,
      |                lead(energy) OVER (PARTITION BY ck ORDER BY w) AS ne
      |         FROM wen),
      |bts AS (SELECT ck, j, bit FROM bits WHERE ne IS NOT NULL),
      |blocks AS (SELECT ck, j // $AudioFpBlock AS b,
      |                  cast(sum(bit << (j % $AudioFpBlock)) AS BIGINT) AS bv
      |           FROM bts GROUP BY 1, 2),
      |sigs AS (SELECT ck,
      |                md5(string_agg(cast(bv AS VARCHAR), ',' ORDER BY b)) AS sig
      |         FROM blocks GROUP BY 1),
      |sdocs AS (SELECT s.sig, count(*) AS n_docs
      |          FROM documents d JOIN sigs s ON d.doc_id % 97 = s.ck
      |          GROUP BY 1),
      |sb AS (SELECT DISTINCT s.sig, k.b, k.bv
      |       FROM sigs s JOIN blocks k ON s.ck = k.ck),
      |scnt AS (SELECT sig, count(*) AS n_blocks FROM sb GROUP BY 1),
      |selfrows AS (SELECT d.sig AS sig_a, d.sig AS sig_b,
      |                    c.n_blocks AS shared_blocks,
      |                    d.n_docs AS docs_a, d.n_docs AS docs_b
      |             FROM sdocs d JOIN scnt c USING (sig)
      |             WHERE d.n_docs > 1),
      |near AS (SELECT x.sig AS sig_a, y.sig AS sig_b,
      |                count(*) AS shared_blocks
      |         FROM sb x JOIN sb y
      |           ON x.b = y.b AND x.bv = y.bv AND x.sig < y.sig
      |         GROUP BY 1, 2
      |         HAVING count(*) >= 2)
      |SELECT * FROM selfrows
      |UNION ALL
      |SELECT n.sig_a, n.sig_b, n.shared_blocks,
      |       ga.n_docs AS docs_a, gb.n_docs AS docs_b
      |FROM near n
      |JOIN sdocs ga ON n.sig_a = ga.sig
      |JOIN sdocs gb ON n.sig_b = gb.sig""".stripMargin

  // ------------------------------------------------------------------
  // m11: image-text contrastive pair table
  // ------------------------------------------------------------------

  /** m11: IMAGE-TEXT CONTRASTIVE PAIR TABLE (beyond-reference) — the
    * cross-modal TRAINING-PAIR emitter a LAION/CLIP-style data build
    * ships (Radford et al. 2021 train on (image, caption) pairs;
    * Schuhmann et al. 2022 §2 describe exactly this filtering): per
    * document, the REAL decoded image's pooled feature vector
    * (m06's ImageIO decode + 4×4 integer average-pool grid) is paired
    * with its caption's token count and t03 quality score, gated the
    * way a pair curation pass gates (caption long enough ≥ 5 tokens,
    * image large enough ≥ 144 px, quality ≥ 2 — the size/caption
    * filters LAION applies before CLIP-score filtering).
    *
    * The feature vector is witnessed by `feat_hash` — md5 over the 16
    * pool cells in (cell_y, cell_x) order — so the oracle (which
    * replays the generator arithmetic per pixel and never decodes a
    * PNG, the m06 convention) catches a single wrong channel sum in
    * any cell of any image.
    *
    * Scale: decode is embarrassingly parallel and the binary drops at
    * decode; the per-doc rollup is a 16-row collect_list (bounded by
    * the pool geometry, never by data); the caption join is doc-keyed.
    * The pair table is the corpus-sized artifact a contrastive trainer
    * streams.
    */
  def imageTextPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the decoded pooled FEATURES are the stored artifact a contrastive
    // data build keys on (LAION ships precomputed features beside the
    // pairs) — materialize them so the pair table never re-decodes.
    // m06 deliberately keeps decoding from pixel_media: its operator
    // IS the decode stage; this table is m11's input, not m06's.
    val feats = graft.models.Shared
      .materialized("pixel_features", spark, sfDir) {
        val media = graft.models.Shared
          .materialized("pixel_media", spark, sfDir) {
            pixelImageTable(spark, sfDir).toDF()
          }.as[MediaRecord]
        decodePixelFeatures(media).toDF()
      }
    val cellStr = (c: org.apache.spark.sql.Column) => concat_ws(",",
      c.getField("cell_y").cast("string"),
      c.getField("cell_x").cast("string"),
      c.getField("px_count").cast("string"),
      c.getField("sum_r").cast("string"),
      c.getField("sum_g").cast("string"),
      c.getField("sum_b").cast("string"))
    val img = feats
      .groupBy($"doc_id", $"width", $"height")
      .agg(sum($"px_count").as("n_px"),
        sort_array(collect_list(struct(
          $"cell_y", $"cell_x", $"px_count",
          $"sum_r", $"sum_g", $"sum_b"))).as("cells"))
      .withColumn("feat_hash",
        md5(concat_ws(";", transform($"cells", cellStr))))
    val captions = graft.models.TextModels.docQuality(spark, sfDir)
      .select($"doc_id", $"n_tokens".as("caption_tokens"),
        $"quality_score")
    img.join(captions, Seq("doc_id"))
      .withColumn("pair_kept",
        $"quality_score" >= 2 && $"caption_tokens" >= 5 && $"n_px" >= 144)
      .select($"doc_id", $"width".cast(LongType).as("width"),
        $"height".cast(LongType).as("height"), $"n_px",
        $"caption_tokens", $"quality_score", $"pair_kept", $"feat_hash")
  }

  /** Generator-replay oracle: every pixel recomputed arithmetically
    * (m06's convention), pooled per cell, hashed in the same
    * (cell_y, cell_x) order with the same "," / ";" framing. */
  lazy val imageTextPairsOracle: String =
    s"""WITH ${graft.models.TextModels.docQualityOracleCtes}
       |img AS (
       |  SELECT doc_id, 8 + doc_id % 16 AS w, 8 + (doc_id // 3) % 16 AS h
       |  FROM documents),
       |px AS (SELECT doc_id, w, h, unnest(range(w * h)) AS p FROM img),
       |vals AS (SELECT doc_id, w, h, p % w AS x, p // w AS y FROM px),
       |pooled AS (
       |  SELECT doc_id, w, h,
       |         (y * 4) // h AS cy, (x * 4) // w AS cx,
       |         count(*) AS cnt,
       |         sum((doc_id + 3 * x + 7 * y) % 256) AS sr,
       |         sum((2 * doc_id + 5 * x + y) % 256) AS sg,
       |         sum((doc_id + x * y) % 256) AS sb
       |  FROM vals GROUP BY 1, 2, 3, 4, 5),
       |fh AS (
       |  SELECT doc_id, w, h, sum(cnt) AS n_px,
       |         md5(string_agg(
       |           cast(cy AS VARCHAR) || ',' || cast(cx AS VARCHAR) || ',' ||
       |           cast(cnt AS VARCHAR) || ',' || cast(sr AS VARCHAR) || ',' ||
       |           cast(sg AS VARCHAR) || ',' || cast(sb AS VARCHAR),
       |           ';' ORDER BY cy, cx)) AS feat_hash
       |  FROM pooled GROUP BY 1, 2, 3)
       |SELECT f.doc_id, cast(f.w AS BIGINT) AS width,
       |       cast(f.h AS BIGINT) AS height,
       |       cast(f.n_px AS BIGINT) AS n_px,
       |       q.n_tokens AS caption_tokens, q.quality_score,
       |       (q.quality_score >= 2 AND q.n_tokens >= 5 AND f.n_px >= 144)
       |         AS pair_kept,
       |       f.feat_hash
       |FROM fh f JOIN q_scored q USING (doc_id)""".stripMargin
}
