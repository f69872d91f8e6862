package graft

import java.security.MessageDigest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultimodalOps

/** m11 pair-table semantics: the REAL ImageIO decode produces
  * generator-exact pooled features (hash recomputed here from the
  * doc_id arithmetic, independently of both engines), every doc yields
  * exactly one pair row, and the keep gate composes caption + quality
  * + image-size exactly.
  */
class ImageTextPairSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The generator arithmetic, pooled and framed exactly as m11. */
  private def expectedFeatHash(id: Long): (Int, Int, Long, String) = {
    val w = 8 + (id % 16).toInt
    val h = 8 + ((id / 3) % 16).toInt
    val cells = scala.collection.mutable.Map
      .empty[(Int, Int), (Long, Long, Long, Long)].withDefaultValue((0L, 0L, 0L, 0L))
    for (y <- 0 until h; x <- 0 until w) {
      val key = (y * 4 / h, x * 4 / w)
      val (c, r, g, b) = cells(key)
      cells(key) = (c + 1,
        r + (id + 3L * x + 7L * y) % 256,
        g + (2L * id + 5L * x + y) % 256,
        b + (id + x.toLong * y) % 256)
    }
    val body = cells.toSeq.sortBy(_._1).map { case ((cy, cx), (c, r, g, b)) =>
      s"$cy,$cx,$c,$r,$g,$b"
    }.mkString(";")
    (w, h, w.toLong * h, md5hex(body))
  }

  test("m11: one pair per doc; decoded features are generator-exact; gates compose") {
    val out = MultimodalOps.imageTextPairs(spark, sfDir)
      .select($"doc_id", $"width", $"height", $"n_px", $"caption_tokens",
        $"quality_score", $"pair_kept", $"feat_hash")
      .as[(Long, Long, Long, Long, Long, Long, Boolean, String)]
      .collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs, "one pair row per document")

    out.foreach { case (id, w, h, nPx, capToks, q, kept, hash) =>
      val (ew, eh, ePx, eHash) = expectedFeatHash(id)
      assert(w == ew && h == eh && nPx == ePx, s"doc $id geometry")
      assert(hash == eHash, s"doc $id pooled features diverge from generator")
      assert(kept == (q >= 2 && capToks >= 5 && nPx >= 144),
        s"doc $id gate")
    }
    // every gate must actually bite somewhere in the fixture
    assert(out.exists(_._7), "some pairs survive")
    assert(out.exists(r => !r._7 && r._4 < 144),
      "the image-size gate drops small images")
    assert(out.exists(r => !r._7 && r._4 >= 144),
      "a text-side gate drops some large-image pairs")
  }
}
