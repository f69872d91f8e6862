package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.AnnIndexPipeline
import graft.streaming.StreamingAnnEncode

/** The streamed encoder must be an EXACT drop-in for the batch
  * add-after-train append: identical (vec_id, cell, m, code) rows for
  * the same arrived vectors against the same frozen codebooks.
  */
class StreamingAnnEncodeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed encode ≡ batch runIncremental, row for row") {
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxId = emb0.agg(max($"vec_id")).as[Long].head()
    val newRows = emb0.filter($"vec_id" < 25)
      .select(($"vec_id" + lit(maxId + 1)).as("vec_id"),
        transform($"embedding", x => x + lit(0.125f)).as("embedding"),
        $"label")

    val snapDir = Files.createTempDirectory("graft-sae-snap").toString
    val unionDir = Files.createTempDirectory("graft-sae-union").toString
    val newDir = Files.createTempDirectory("graft-sae-new").toString
    emb0.write.parquet(s"$snapDir/embeddings.parquet")
    emb0.unionByName(newRows).write.parquet(s"$unionDir/embeddings.parquet")
    newRows.write.mode("overwrite").parquet(newDir)

    // batch: train + encode the snapshot, then the incremental append
    val wh = Files.createTempDirectory("graft-sae-wh").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(snapDir)
    val preCodes = spark.read.parquet(s"$wh/ann_codes").count()
    pipe.runIncremental(unionDir)
    val batchNew = spark.read.parquet(s"$wh/ann_codes")
      .filter($"vec_id" > maxId)
      .select($"vec_id", $"cell", $"m", $"code")
      .as[(Long, Long, Int, Long)].collect().toSet

    // streamed: same arrived files, same frozen codebooks
    val ckpt = Files.createTempDirectory("graft-sae-ckpt").toString
    val out = Files.createTempDirectory("graft-sae-out").toString
    val q = StreamingAnnEncode.runAvailableNow(spark, newDir, wh, ckpt, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .select($"vec_id", $"cell", $"m".cast("int"), $"code")
      .as[(Long, Long, Int, Long)].collect()

    assert(streamed.nonEmpty)
    assert(streamed.length == streamed.toSet.size, "no duplicate rows")
    assert(streamed.toSet == batchNew,
      s"streamed codes diverge: only-streamed=" +
        s"${(streamed.toSet -- batchNew).take(3)}, only-batch=" +
        s"${(batchNew -- streamed.toSet).take(3)}")
    assert(streamed.length == 25 * graft.models.SimilarityModels.IvfPqM)
    assert(preCodes + streamed.length ==
      spark.read.parquet(s"$wh/ann_codes").count())
  }
}
