package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.SimilarityModels
import graft.streaming.StreamingDomainMix

/** The streamed mixture stamp must be an EXACT drop-in for the batch
  * c14 row against the same frozen cells + weights: identical
  * (vec_id, cell, share_micros, mix_weight, repeat_factor, n_copies)
  * for every streamed vector.
  */
class StreamingDomainMixSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed mixture stamp ≡ batch c14, row for row") {
    // batch c14 over the snapshot = the frozen epoch
    val batch = SimilarityModels.domainMixture(spark, sfDir)
      .select($"vec_id", $"cell", $"share_micros", $"mix_weight",
        $"repeat_factor", $"n_copies")
    val expected = batch
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSet
    assert(expected.nonEmpty)

    // export the frozen tables the ingest seat reads: the trained
    // coarse cells and the per-cell weight verdicts
    val wh = Files.createTempDirectory("graft-sdm-wh").toString
    val base = SimilarityModels.doubledEmb(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    SimilarityModels.coarseCodebook(base)
      .write.parquet(s"$wh/mix_cells")
    batch.select($"cell", $"share_micros", $"mix_weight", $"repeat_factor")
      .distinct().write.parquet(s"$wh/mix_weights")

    // stream the SAME vectors through the frozen tables
    val inDir = Files.createTempDirectory("graft-sdm-in").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.mode("overwrite").parquet(inDir)
    val ckpt = Files.createTempDirectory("graft-sdm-ckpt").toString
    val out = Files.createTempDirectory("graft-sdm-out").toString
    val q = StreamingDomainMix.runAvailableNow(spark, inDir, wh, ckpt, out)
    q.awaitTermination()

    val streamed = spark.read.parquet(out)
      .select($"vec_id", $"cell", $"share_micros", $"mix_weight",
        $"repeat_factor", $"n_copies")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    assert(streamed.length == expected.size, "every vector stamped once")
    assert(streamed.toSet == expected,
      s"streamed mixture diverges: only-streamed=" +
        s"${(streamed.toSet -- expected).take(3)}, only-batch=" +
        s"${(expected -- streamed.toSet).take(3)}")
  }

  test("a cell unseen in the frozen epoch gets the neutral verdict, not nulls") {
    val batch = SimilarityModels.domainMixture(spark, sfDir)
    // frozen warehouse with one cell's weight row REMOVED — the state a
    // streamed vector hits when its argmax cell had zero batch members
    val victim = batch.groupBy($"cell").count()
      .orderBy($"count", $"cell").select($"cell").as[Long].head()
    val victimVecs = batch.filter($"cell" === victim)
      .select($"vec_id").as[Long].collect().toSet
    assert(victimVecs.nonEmpty)
    val wh = Files.createTempDirectory("graft-sdm-wh2").toString
    val base = SimilarityModels.doubledEmb(
      spark.read.parquet(s"$sfDir/embeddings.parquet"))
    SimilarityModels.coarseCodebook(base)
      .write.parquet(s"$wh/mix_cells")
    batch.select($"cell", $"share_micros", $"mix_weight", $"repeat_factor")
      .distinct().filter($"cell" =!= victim)
      .write.parquet(s"$wh/mix_weights")

    val inDir = Files.createTempDirectory("graft-sdm-in2").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .write.mode("overwrite").parquet(inDir)
    val ckpt = Files.createTempDirectory("graft-sdm-ckpt2").toString
    val out = Files.createTempDirectory("graft-sdm-out2").toString
    StreamingDomainMix.runAvailableNow(spark, inDir, wh, ckpt, out)
      .awaitTermination()

    val stamped = spark.read.parquet(out)
    assert(stamped.filter($"share_micros".isNull || $"mix_weight".isNull ||
      $"repeat_factor".isNull || $"n_copies".isNull).count() == 0,
      "no null verdict columns, ever")
    val victimRows = stamped.filter($"vec_id".isin(victimVecs.toSeq: _*))
      .select($"cell", $"share_micros", $"mix_weight", $"repeat_factor",
        $"n_copies")
      .as[(Long, Long, Double, Double, Long)].collect()
    assert(victimRows.nonEmpty)
    assert(victimRows.forall(r =>
      r._1 == victim && r._2 == 0L && r._3 == 1.0 && r._4 == 1.0 &&
        r._5 == 1L),
      s"unseen cell must stamp the neutral keep-one verdict, got " +
        s"${victimRows.take(3).toSeq}")
  }
}
