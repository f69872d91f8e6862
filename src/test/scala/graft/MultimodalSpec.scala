package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultimodalOps

/** The multimodal plumbing: typed Dataset → mapPartitions decode path
  * must agree with the SQL-expressible md5 formulation used by the
  * oracle-checked m01 query.
  */
class MultimodalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("headerDecode parses real PNG and JPEG headers (pure JVM)") {
    // generated images round-trip: dims parsed back out of the bytes
    assert(MultimodalOps.headerDecode(
      MultimodalOps.pngBytes(640, 480, 2)) == Some((640, 480, 3)))
    assert(MultimodalOps.headerDecode(
      MultimodalOps.pngBytes(31, 17, 0)) == Some((31, 17, 1)))
    assert(MultimodalOps.headerDecode(
      MultimodalOps.pngBytes(5, 9, 6)) == Some((5, 9, 4)))
    assert(MultimodalOps.headerDecode(
      MultimodalOps.jpegBytes(800, 600)) == Some((800, 600, 3)))
    // a REAL png from the wild: the canonical 1×1 transparent PNG
    // (RGBA, color type 6) every image toolchain emits
    val onePixel = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNk" +
        "YPhfDwAChwGA60e6kgAAAABJRU5ErkJggg==")
    assert(MultimodalOps.headerDecode(onePixel) == Some((1, 1, 4)))
    // non-images miss and fall back to the deterministic stub
    val text = "not an image".getBytes("UTF-8")
    assert(MultimodalOps.headerDecode(text).isEmpty)
    assert(MultimodalOps.decode(text) == MultimodalOps.fakeDecode(text))
  }

  test("headerDecode skips legal 0xFF fill bytes between JPEG segments") {
    // JPEG B.1.1.2 allows any number of 0xFF fill bytes before a
    // marker code — pad the APP0 and SOF0 markers and the walk must
    // still land on the frame header instead of misreading a length
    val j = MultimodalOps.jpegBytes(800, 600)
    val fill = Array(0xff.toByte, 0xff.toByte)
    val sofAt = j.indexOfSlice(Array(0xff.toByte, 0xc0.toByte))
    val padded = j.slice(0, 2) ++ fill ++ j.slice(2, sofAt) ++ fill ++
      j.drop(sofAt)
    assert(MultimodalOps.headerDecode(padded) == Some((800, 600, 3)))
  }

  test("generated file sizes match the oracle's byte-accounting constants") {
    assert(MultimodalOps.pngBytes(16, 16, 2).length ==
      MultimodalOps.PngBytesLen)
    assert(MultimodalOps.pngBytes(4096, 4096, 0).length ==
      MultimodalOps.PngBytesLen)
    assert(MultimodalOps.jpegBytes(16, 16).length ==
      MultimodalOps.JpegBytesLen)
    assert(MultimodalOps.jpegBytes(4096, 4096).length ==
      MultimodalOps.JpegBytesLen)
    for (n <- Seq(1, 7, 24))
      assert(MultimodalOps.gifBytes(64, 48, Seq.fill(n)(5)).length ==
        MultimodalOps.GifBytesBase + MultimodalOps.GifBytesPerFrame * n)
  }

  test("gifDecode walks real multi-frame GIF structure (round-trip)") {
    // generated animations round-trip: dims, frame count, per-frame
    // delays all parsed back out of the bytes
    val delays = Seq(4, 13, 7, 10)
    val meta = MultimodalOps.gifDecode(
      MultimodalOps.gifBytes(100, 80, delays))
    assert(meta ==
      Some(MultimodalOps.AnimMeta(100, 80, delays.size, delays)))
    // a REAL gif from the wild: the canonical 1×1 transparent GIF89a
    // (global color table + graphic control extension, zero delay)
    val onePixel = java.util.Base64.getDecoder.decode(
      "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7")
    assert(MultimodalOps.gifDecode(onePixel) ==
      Some(MultimodalOps.AnimMeta(1, 1, 1, Seq(0))))
    // non-GIFs (and stills of other formats) miss cleanly
    assert(MultimodalOps.gifDecode(
      MultimodalOps.pngBytes(8, 8, 2)).isEmpty)
    assert(MultimodalOps.gifDecode("not a gif".getBytes("UTF-8")).isEmpty)
    // truncated payload (no trailer) misses instead of throwing
    val cut = MultimodalOps.gifBytes(10, 10, Seq(5))
    assert(MultimodalOps.gifDecode(cut.dropRight(3)).isEmpty)
  }

  test("m02 samples parsed frames under the ≤8 budget (round-trip)") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = MultimodalOps.frameSampleSummary(spark, sfDir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getAs[Long]("doc_id")
      val n = 1 + (id % 24)
      val stride = (n + 7) / 8
      assert(r.getAs[Long]("n_frames") == n, s"doc $id n_frames")
      assert(r.getAs[Long]("sampled_frames") == (n + stride - 1) / stride,
        s"doc $id sampled")
      assert(r.getAs[Long]("sampled_frames") <= 8, s"doc $id budget")
      assert(r.getAs[Long]("byte_len") ==
        MultimodalOps.GifBytesBase + MultimodalOps.GifBytesPerFrame * n,
        s"doc $id bytes")
      assert(r.getAs[Long]("total_delay_cs") ==
        (0L until n).map(i => 4 + ((id + i) % 10)).sum, s"doc $id delay")
    }
  }

  test("m01 parses headers back out of generated binaries (round-trip)") {
    val sfDir = "/root/testdata/sf0.001"
    // expected metadata straight from the doc_id arithmetic, no parsing
    val expected = graft.catalog.Tables.documents(spark, sfDir)
      .selectExpr("doc_id",
        "16 + (doc_id % 64) AS width",
        "16 + ((doc_id div 7) % 64) AS height",
        "CASE WHEN doc_id % 3 = 2 THEN 'image/jpeg' ELSE 'image/png' END AS format",
        "CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels")
      .groupBy($"format")
      .agg(count(lit(1)).as("media_count"),
        sum($"width".cast("long")).as("width_sum"),
        sum($"height".cast("long")).as("height_sum"),
        sum($"channels".cast("long")).as("channel_sum"))
    val actual = MultimodalOps.mediaMetaSummary(spark, sfDir)
      .drop("total_bytes")
    val a = actual.orderBy($"format").collect().map(_.toSeq).toSeq
    val b = expected.orderBy($"format").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 2) // png + jpeg
  }

  test("m03 plans resizes from parsed headers (round-trip vs arithmetic)") {
    val sfDir = "/root/testdata/sf0.001"
    // expected straight from imageTable's doc_id arithmetic, no parsing
    val expected = graft.catalog.Tables.documents(spark, sfDir)
      .selectExpr("doc_id",
        "16 + (doc_id % 64) AS width",
        "16 + ((doc_id div 7) % 64) AS height",
        "CASE WHEN doc_id % 3 = 2 THEN 'image/jpeg' ELSE 'image/png' END AS format",
        "CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 3 END AS channels")
      .selectExpr("format", "channels", "width", "height",
        "(width * 224) div greatest(width, height) AS out_w",
        "(height * 224) div greatest(width, height) AS out_h")
      .groupBy($"format")
      .agg(count(lit(1)).as("media_count"),
        sum($"out_w".cast("long")).as("out_width_sum"),
        sum($"out_h".cast("long")).as("out_height_sum"),
        sum(($"out_w" * $"out_h" * $"channels").cast("long"))
          .cast("long").as("thumb_bytes"),
        sum(when($"width" >= $"height", 1L).otherwise(0L))
          .as("landscape_count"))
    val actual = MultimodalOps.resizeSummary(spark, sfDir)
    val a = actual.orderBy($"format").collect().map(_.toSeq).toSeq
    val b = expected.orderBy($"format").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.size == 2) // png + jpeg
    // the fit is aspect-preserving into a 224 box: long side maps to 224
    val plans = MultimodalOps.resizePlan(MultimodalOps.decodeFeatures(
      MultimodalOps.imageTable(spark, sfDir))).collect()
    assert(plans.forall(p => math.max(p.out_w, p.out_h) == 224))
    // the fallback path (non-image payloads) still plans without error
    val fallback = MultimodalOps.resizePlan(MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sfDir))).collect()
    assert(fallback.forall(p => math.max(p.out_w, p.out_h) == 224))
  }

  test("decoder stub is deterministic and dimension-bounded") {
    val (w1, h1, c1) = MultimodalOps.fakeDecode("abc".getBytes("UTF-8"))
    val (w2, h2, c2) = MultimodalOps.fakeDecode("abc".getBytes("UTF-8"))
    assert((w1, h1, c1) == (w2, h2, c2))
    assert(w1 >= 64 && w1 <= 64 + 255 * 8 && (c1 == 1 || c1 == 3))
  }

  test("wavDecode walks real RIFF chunk structure (round-trip)") {
    val b = MultimodalOps.wavBytes(44100, 2, 16, 100)
    assert(b.length == 44 + 100 * 4)
    assert(MultimodalOps.wavDecode(b)
      == Some(MultimodalOps.WavMeta(44100, 2, 16, 100)))
    // mono 8-bit: block align 1
    assert(MultimodalOps.wavDecode(MultimodalOps.wavBytes(8000, 1, 8, 64))
      == Some(MultimodalOps.WavMeta(8000, 1, 8, 64)))
  }

  test("wavDecode skips unknown chunks (real WAVs carry LIST/fact)") {
    // splice a LIST chunk between fmt and data, fixing the RIFF size
    val base = MultimodalOps.wavBytes(16000, 1, 16, 10)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    val spliced = base.slice(0, 36) ++ list ++ base.slice(36, base.length)
    val newSize = spliced.length - 8
    for (i <- 0 until 4)
      spliced(4 + i) = ((newSize >>> (8 * i)) & 0xff).toByte
    assert(MultimodalOps.wavDecode(spliced)
      == Some(MultimodalOps.WavMeta(16000, 1, 16, 10)))
  }

  test("wavDecode rejects truncated, non-RIFF, and non-PCM payloads") {
    val good = MultimodalOps.wavBytes(22050, 2, 16, 20)
    assert(MultimodalOps.wavDecode(good.take(30)).isEmpty)
    assert(MultimodalOps.wavDecode("not audio at all".getBytes).isEmpty)
    val nonPcm = good.clone()
    nonPcm(20) = 3 // audioFormat = IEEE float
    assert(MultimodalOps.wavDecode(nonPcm).isEmpty)
  }

  test("wavDecode rejects a crafted negative chunk length (no infinite loop)") {
    // len = -8 makes `i += 8 + len + (len & 1)` a no-op: without the
    // guard the chunk walk spins forever on an executor thread. The
    // decode must return None, and must return at all — run it on a
    // watchdog thread so a regression fails the suite instead of
    // hanging it.
    val bad = MultimodalOps.wavBytes(16000, 1, 16, 10)
    // first chunk ("fmt ") length field at offset 16 → 0xFFFFFFF8 (-8)
    for (i <- 0 until 4) bad(16 + i) = (if (i < 1) 0xf8 else 0xff).toByte
    @volatile var out: Option[Option[MultimodalOps.WavMeta]] = None
    val t = new Thread(() => { out = Some(MultimodalOps.wavDecode(bad)) })
    t.setDaemon(true); t.start(); t.join(5000)
    assert(out.contains(None), "decode must terminate and reject")
  }

  test("m08: real PCM samples round-trip through the RIFF data chunk") {
    val b = MultimodalOps.pcmWavBytes(16000, 2, 50, 123L)
    val parsed = MultimodalOps.wavPcm16(b)
    assert(parsed.map(_._1) == Some(MultimodalOps.WavMeta(16000, 2, 16, 50)))
    // the decoded per-channel stats must equal the generator's own fold
    // — any interleave/offset/sign mistake in the byte walk breaks this
    val ds = Seq(MultimodalOps.MediaRecord(123L, b, "audio/wav")).toDS()
    val stats = MultimodalOps.decodePcmStats(ds).collect().sortBy(_.ch)
    assert(stats.length == 2)
    for (st <- stats) {
      val vals = (0 until 50).map(f => MultimodalOps.pcmSample(123L, st.ch, f))
      assert(st.n_frames == 50L)
      assert(st.sum_s == vals.map(_.toLong).sum, s"ch ${st.ch} sum")
      assert(st.sum_sq == vals.map(v => v.toLong * v).sum, s"ch ${st.ch} sq")
      assert(st.min_s == vals.min && st.max_s == vals.max)
    }
    // negative samples actually occur (the sign extension is exercised)
    assert(stats.exists(_.min_s < 0))
    // non-16-bit and truncated payloads are rejected, not misread
    assert(MultimodalOps.wavPcm16(
      MultimodalOps.wavBytes(8000, 1, 8, 64)).isEmpty)
    assert(MultimodalOps.wavPcm16(b.take(60)).isEmpty)
  }

  test("mp4Decode walks real ISO-BMFF box structure (round-trip)") {
    val b = MultimodalOps.mp4Bytes("isom", 90000, 450000, 2, 32)
    assert(b.length == MultimodalOps.FtypLen + 8 + MultimodalOps.MvhdLen +
      2 * MultimodalOps.TrakLen + 8 + 32)
    assert(MultimodalOps.mp4Decode(b)
      == Some(MultimodalOps.Mp4Meta("isom", 90000, 450000, 2)))
  }

  test("mp4Decode skips unknown boxes and rejects malformed payloads") {
    // splice a top-level free box between ftyp and moov
    val base = MultimodalOps.mp4Bytes("mp42", 1000, 5000, 1, 0)
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4)
    val spliced = base.take(MultimodalOps.FtypLen) ++ free ++
      base.drop(MultimodalOps.FtypLen)
    assert(MultimodalOps.mp4Decode(spliced)
      == Some(MultimodalOps.Mp4Meta("mp42", 1000, 5000, 1)))
    assert(MultimodalOps.mp4Decode(base.take(40)).isEmpty)
    assert(MultimodalOps.mp4Decode("definitely not a video".getBytes).isEmpty)
  }

  test("m05 parses container metadata back out of generated MP4s (round-trip)") {
    val sfDir = "/root/testdata/sf0.001"
    val rows = MultimodalOps.decodeVideo(
      MultimodalOps.videoTable(spark, sfDir)).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length == docs, "every generated MP4 must parse")
    val bad = rows.filterNot { f =>
      val id = f.doc_id
      val ts = (id % 4) match {
        case 0 => 600; case 1 => 1000; case 2 => 90000; case _ => 48000
      }
      f.brand == (if ((id / 5) % 2 == 0) "isom" else "mp42") &&
        f.n_tracks == 1 + (id % 3).toInt &&
        f.duration_ms == (1000 + id % 9000) * 1000L / ts
    }
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).toSeq}")
  }

  test("m04 parses audio metadata back out of generated WAVs (round-trip)") {
    val sfDir = "/root/testdata/sf0.001"
    val feats = MultimodalOps.decodeAudio(
      MultimodalOps.audioTable(spark, sfDir))
    val rows = feats.collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.length == docs, "every generated WAV must parse")
    // parsed values equal the generator's doc_id arithmetic
    val bad = rows.filterNot { f =>
      val id = f.doc_id
      val rate = (id % 4) match {
        case 0 => 8000; case 1 => 16000; case 2 => 22050; case _ => 44100
      }
      f.sample_rate == rate &&
        f.channels == 1 + ((id / 7) % 2).toInt &&
        f.bits == (if ((id / 3) % 2 == 0) 8 else 16) &&
        f.n_samples == 64 + (id % 128) &&
        f.duration_us == f.n_samples * 1000000L / rate
    }
    assert(bad.isEmpty, s"mismatch: ${bad.take(3).toSeq}")
  }

  test("m06 decodes REAL pixels losslessly through ImageIO (round-trip vs arithmetic)") {
    val sfDir = "/root/testdata/sf0.001"
    val cells = MultimodalOps.decodePixelFeatures(
      MultimodalOps.pixelImageTable(spark, sfDir)).collect()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(cells.length == docs * 16, "every doc must decode to 16 pool cells")
    // replay the generator arithmetic per cell and compare the DECODED sums
    val bad = cells.filterNot { c =>
      val id = c.doc_id
      val (w, h) = (8 + (id % 16).toInt, 8 + ((id / 3) % 16).toInt)
      var (n, sr, sg, sb) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h if y * 4 / h == c.cell_y;
           x <- 0 until w if x * 4 / w == c.cell_x) {
        n += 1
        sr += (id + 3L * x + 7L * y) % 256
        sg += (2L * id + 5L * x + y) % 256
        sb += (id + x.toLong * y) % 256
      }
      c.width == w && c.height == h && c.px_count == n &&
        c.sum_r == sr && c.sum_g == sg && c.sum_b == sb
    }
    assert(bad.isEmpty, s"decoded pixels diverge from arithmetic: ${bad.take(3).toSeq}")
  }

  test("ImageIO-encoded files parse through the hand-rolled header walkers") {
    // cross-validation of two independent implementations: the JDK's
    // encoders against this library's byte-level parsers
    def encode(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 37 + y) % 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    assert(MultimodalOps.headerDecode(encode("png", 33, 21)) == Some((33, 21, 3)))
    val Some((jw, jh, jc)) = MultimodalOps.headerDecode(encode("jpg", 17, 29))
    assert((jw, jh, jc) == (17, 29, 3))
    val gif = encode("gif", 15, 11)
    val anim = MultimodalOps.gifDecode(gif)
    assert(anim.exists(a => a.width == 15 && a.height == 11 && a.frames == 1))
  }

  test("JPEG round-trip is approximate, PNG exact (why m06 pins PNG)") {
    val id = 42L
    val (w, h) = (16, 16)
    def raster(bytes: Array[Byte]): Array[Int] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      (for (y <- 0 until h; x <- 0 until w) yield img.getRGB(x, y) & 0xffffff).toArray
    }
    val src = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = ((id + 3 * x + 7 * y) % 256).toInt
      val g = ((2 * id + 5 * x + y) % 256).toInt
      val b = ((id + x * y) % 256).toInt
      src.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    def bytes(fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, fmt, baos); baos.toByteArray
    }
    val orig = (for (y <- 0 until h; x <- 0 until w) yield src.getRGB(x, y) & 0xffffff).toArray
    assert(raster(bytes("png")).sameElements(orig), "PNG must round-trip losslessly")
    val jpeg = raster(bytes("jpg"))
    val meanAbsErr = orig.zip(jpeg).map { case (a, b) =>
      math.abs((a & 0xff) - (b & 0xff))
    }.sum.toDouble / orig.length
    assert(meanAbsErr > 0.0, "JPEG is lossy on this pattern")
    assert(meanAbsErr < 64.0, "JPEG error should still be bounded")
  }

  test("m07: a JPEG re-encode of a PNG is caught as a perceptual duplicate") {
    // Byte-level dedup (d01) can never match a PNG against its
    // JPEG-ized copy — the payloads share no bytes. The aHash must:
    // each 4×4 cell is either clearly above or clearly below the
    // global mean on a structured image, so JPEG's small pixel errors
    // can't flip bits. Build a high-contrast quadrant image (the kind
    // of margin real photos have at aHash granularity), encode it
    // BOTH ways, and require identical hashes.
    val (w, h) = (32, 24)
    val src = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val bright = (x < w / 2) ^ (y < h / 2)
      val v = if (bright) 220 else 30
      src.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    def bytes(fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, fmt, baos); baos.toByteArray
    }
    val media = Seq(
      MultimodalOps.MediaRecord(1L, bytes("png"), "image/png"),
      MultimodalOps.MediaRecord(2L, bytes("jpg"), "image/jpeg")).toDS()
    val hashes = MultimodalOps.perceptualHashes(media)
      .as[(Long, Long)].collect().toMap
    assert(hashes.size == 2)
    val hamming = java.lang.Long.bitCount(hashes(1L) ^ hashes(2L))
    assert(hamming == 0,
      s"re-encoded copy must hash identically, got Hamming $hamming " +
        s"(${hashes(1L).toBinaryString} vs ${hashes(2L).toBinaryString})")
    // and the checkerboard pattern actually exercises both bit values
    assert(hashes(1L) != 0L && hashes(1L) != 0xffffL)
  }

  test("ahash64 splits 16-bit collisions and sparsifies the near-tier buckets") {
    // DESIGNED 16-bit collision: swap two pixels WITHIN one 4×4-grid
    // cell (cell sums unchanged ⇒ ahash16 identical) but ACROSS the
    // 8×8-grid boundary inside that cell (sub-cell sums change ⇒
    // ahash64 differs) — the exact failure mode that makes a 2¹⁶ value
    // space bucket-heavy at billion-image scale and the widening's
    // whole point.
    val (w, h) = (16, 16) // 4-grid cell = 4×4 px, 8-grid cell = 2×2 px
    // a bright 2×2 block inside 4-grid cell (0,0), placed in two
    // different 2×2 sub-cells of that SAME cell: the 4×4 cell sum is
    // identical either way (ahash16 can't tell), but the bright 8-grid
    // sub-cell moves from bit 0 to bit 9 (ahash64 must tell)
    def img(ox: Int, oy: Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val bright = x >= ox && x < ox + 2 && y >= oy && y < oy + 2
        val v = if (bright) 200 else 0
        im.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", baos); baos.toByteArray
    }
    val (pA, pB) = (img(0, 0), img(2, 2))
    assert(MultimodalOps.ahash16(pA) == MultimodalOps.ahash16(pB),
      "in-cell swap must not move the 16-bit hash")
    assert(MultimodalOps.ahash64(pA) != MultimodalOps.ahash64(pB),
      "the 8x8 grid must see the sub-cell difference")

    // plan-level: the SAME signature-grain dedup runs on 64-bit frame
    // hashes. Equal content ⇒ equal hash sequence under ANY width, so
    // every true duplicate group survives the widening; but the 16-bit
    // exact tier ALSO merges distinct contents whose frame-hash
    // sequences collide in the 2¹⁶ space (measured here: its largest
    // "exact" group is far bigger than any content group the % 97
    // fixture contains) — the widening REFINES those groups apart,
    // which is its whole point. Refinement ⇒ more, smaller groups.
    def fhashes(hash: Array[Byte] => Option[Long]) =
      MultimodalOps.videoKeyframeTable(spark, "/root/testdata/sf0.001")
        .mapPartitions(it =>
          it.flatMap(v => hash(v.media).map(h => (v.doc_id, v.f, h))))
        .toDF("doc_id", "f", "fhash")
    val via16 = MultimodalOps.videoSignatureDedup(
      fhashes(MultimodalOps.ahash16)).cache()
    val via64 = MultimodalOps.videoSignatureDedup(
      fhashes(MultimodalOps.ahash64)).cache()
    def exactGroupSizes(df: org.apache.spark.sql.DataFrame) = df
      .filter($"sig_a" === $"sig_b").select($"docs_a")
      .as[Long].collect().sorted.toSeq
    val (g16, g64) = (exactGroupSizes(via16), exactGroupSizes(via64))
    assert(g64.nonEmpty, "the % 97 fixture must produce duplicate groups")
    assert(g64.length >= g16.length && g64.max <= g16.max,
      s"widening must refine exact groups (16-bit sizes $g16 vs $g64)")
    // true duplicates survive: every content key with >1 doc still
    // groups, so the smallest plausible content-group size is present
    assert(g64.max >= 500 / 97,
      "content-identical docs must still share a 64-bit signature")
    def nearPairs(df: org.apache.spark.sql.DataFrame) =
      df.filter($"sig_a" =!= $"sig_b").count()
    assert(nearPairs(via64) <= nearPairs(via16),
      "a wider hash must never densify near-tier buckets")
    // and the widened space is no coarser: at least as many distinct
    // frame-hash values over the same frames
    val d16 = fhashes(MultimodalOps.ahash16)
      .select($"fhash").distinct().count()
    val d64 = fhashes(MultimodalOps.ahash64)
      .select($"fhash").distinct().count()
    assert(d64 >= d16)
    via16.unpersist(); via64.unpersist()
  }

  test("m10: decoded window energies equal the generator arithmetic, content keys collide") {
    // decode path: the real-WAV window energies must equal the
    // (ck, channel, frame) sample arithmetic folded directly
    val media = MultimodalOps
      .audioContentTable(spark, "/root/testdata/sf0.001")
      .filter($"doc_id".isin(5L, 102L, 6L)).cache()
    val decoded = MultimodalOps.windowEnergies(media)
      .as[(Long, Int, Long)].collect()
      .map { case (d, w, e) => (d, w) -> e }.toMap
    def expected(id: Long): Map[(Long, Int), Long] = {
      val ck = id % 97
      val channels = 1 + ((ck / 7) % 2).toInt
      val n = 64 + (ck % 128).toInt
      (0 until n).flatMap { f =>
        (0 until channels).map { c =>
          val s = MultimodalOps.pcmSample(ck, c, f).toLong
          (id, f / MultimodalOps.AudioFpWindow) -> s * s
        }
      }.groupMapReduce(_._1)(_._2)(_ + _)
    }
    for (id <- Seq(5L, 102L, 6L); ((d, w), e) <- expected(id))
      assert(decoded((d, w)) == e, s"window energy mismatch at ($d, $w)")
    // content keys: doc 5 and doc 102 share ck=5 → identical window
    // energies → identical fingerprints; doc 6 differs
    val e5 = decoded.collect { case ((5L, w), e) => w -> e }.toMap
    val e102 = decoded.collect { case ((102L, w), e) => w -> e }.toMap
    assert(e5 == e102, "same content key must decode identically")
    media.unpersist()

    // and the dedup surface groups them: some exact group holds ≥ 2
    // docs, every near pair shares ≥ 2 positional blocks
    val out = MultimodalOps
      .audioFingerprintDedup(spark, "/root/testdata/sf0.001").cache()
    val exactGroups = out.filter($"sig_a" === $"sig_b")
      .select($"docs_a").as[Long].collect()
    assert(exactGroups.nonEmpty && exactGroups.max >= 500 / 97,
      "content-identical recordings must share a signature group")
    val nearBad = out.filter($"sig_a" =!= $"sig_b" && $"shared_blocks" < 2)
      .count()
    assert(nearBad == 0)
    out.unpersist()
  }

  test("m07: pixel-identical images under different doc_ids share an exact group") {
    // the fixture keys content on doc_id % 97 — doc 5 and doc 102
    // carry byte-identical PNGs, so their hashes must collide exactly,
    // and a doc with different content must not (with these generator
    // polynomials, content keys 5 and 6 differ in many cells)
    val media = MultimodalOps.phashImageTable(spark, "/root/testdata/sf0.001")
      .filter($"doc_id".isin(5L, 102L, 6L)).cache()
    val hashes = MultimodalOps.perceptualHashes(media)
      .as[(Long, Long)].collect().toMap
    assert(hashes(5L) == hashes(102L), "same content key ⇒ same aHash")
    assert(hashes(5L) != hashes(6L), "different content ⇒ different aHash")
    media.unpersist()
  }
}
