package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.CurationModels
import graft.streaming.StreamingFim

/** The streamed FIM index must equal the batch c16 output row-for-row
  * for the same arrived documents — pinned end-to-end through a real
  * file stream (schema declaration, parquet source, append sink), not
  * just by the shared projection.
  */
class StreamingFimSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed FIM index ≡ batch c16, row for row") {
    val cols = Seq("doc_id", "n_tokens", "fim_applied",
      "n_prefix", "n_middle", "n_suffix", "out_hash")
    val expected = CurationModels.fimTransform(spark, sfDir)
      .select(cols.map(col): _*)
      .as[(Long, Long, Boolean, Option[Long], Option[Long], Option[Long], String)]
      .collect().toSet
    assert(expected.nonEmpty)

    val inDir = Files.createTempDirectory("graft-sfim-in").toString
    spark.read.parquet(s"$sfDir/documents.parquet")
      .write.mode("overwrite").parquet(inDir)
    val ckpt = Files.createTempDirectory("graft-sfim-ckpt").toString
    val out = Files.createTempDirectory("graft-sfim-out").toString
    val q = StreamingFim.runAvailableNow(spark, inDir, ckpt, out)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .select(cols.map(col): _*)
      .as[(Long, Long, Boolean, Option[Long], Option[Long], Option[Long], String)]
      .collect()
    assert(streamed.length == expected.size, "every doc transformed once")
    assert(streamed.toSet == expected,
      s"streamed FIM diverges: only-streamed=" +
        s"${(streamed.toSet -- expected).take(3)}, only-batch=" +
        s"${(expected -- streamed.toSet).take(3)}")
  }
}
