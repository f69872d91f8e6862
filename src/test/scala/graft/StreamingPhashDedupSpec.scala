package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultimodalOps
import graft.streaming.StreamingPhashDedup

/** The streaming seat of the m07 perceptual-hash tier: the single-pass
  * hash must equal the batch (windowed) formulation bit-for-bit, and
  * the stream-static + within-watermark dedup must reproduce the batch
  * new-identity verdict over an arriving media batch.
  */
class StreamingPhashDedupSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("ahash16 (single-pass) ≡ perceptualHashes (windowed) over the fixture") {
    val media = MultimodalOps.phashImageTable(spark, sfDir)
      .filter($"doc_id" < 120).cache()
    val windowed = MultimodalOps.perceptualHashes(media)
      .as[(Long, Long)].collect().toMap
    val single = media.collect()
      .map(r => r.doc_id -> MultimodalOps.ahash16(r.media).get).toMap
    assert(windowed.keySet == single.keySet && windowed.keySet.nonEmpty)
    for ((id, h) <- windowed)
      assert(single(id) == h, s"doc $id: single-pass ${single(id)} != windowed $h")
    media.unpersist()
  }

  test("streamed new-hash identities match the batch verdict") {
    // known index: the batch hashes of content keys 0..49; arriving
    // batch: docs 50..60 (new content), doc 30 (hash already known),
    // doc 147 (ck 50 — an in-stream duplicate of doc 50's content)
    val media = MultimodalOps.phashImageTable(spark, sfDir)
      .filter($"doc_id" < 200).cache()
    val hashes = MultimodalOps.perceptualHashes(media)
      .as[(Long, Long)].collect().toMap
    val known = hashes.filter(_._1 < 50).values.toSet
    val knownDf = known.toSeq.toDF("ahash")

    val arriving = (50L to 60L) :+ 30L :+ 147L
    val inDir = Files.createTempDirectory("graft-phash-in").toString
    media.filter($"doc_id".isin(arriving: _*)).toDF()
      .write.mode("overwrite").parquet(inDir)

    val ckpt = Files.createTempDirectory("graft-phash-ckpt").toString
    val out = Files.createTempDirectory("graft-phash-out").toString
    val q = StreamingPhashDedup.runAvailableNow(
      spark, inDir, knownDf, ckpt, out)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .select($"ahash", $"doc_id").as[(Long, Long)].collect()
    val expected = arriving.map(hashes).toSet -- known
    assert(streamed.map(_._1).toSet == expected,
      s"streamed hashes diverge from the batch verdict")
    // one identity row per hash: doc 147's content (ck 50) must NOT
    // appear as a second row beside doc 50's
    assert(streamed.length == expected.size)
    // doc 30's hash was known — it must not re-register. Precondition
    // and behavior asserted SEPARATELY (a disjunction would silently
    // stop checking if a fixture shift dropped hash(30) from the known
    // set — round-10 advice)
    assert(known.contains(hashes(30L)),
      "fixture precondition: doc 30's hash must be in the known set")
    assert(!streamed.map(_._1).contains(hashes(30L)),
      "a known hash must not re-register through the stream")
    media.unpersist()
  }
}
