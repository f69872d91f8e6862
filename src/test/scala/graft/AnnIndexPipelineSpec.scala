package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.AnnIndexPipeline

/** IVF-PQ index maintenance: full build + frozen-codebook incremental
  * append ≡ one full build over the union; the append never rewrites
  * existing rows; appended codes stay inside the 4-bit code range.
  */
class AnnIndexPipelineSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def tableRows(path: String): Seq[String] = {
    val df = spark.read.parquet(path)
    df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq
  }

  test("incremental append over new vectors ≡ full rebuild over the union") {
    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxId = emb0.agg(max($"vec_id")).as[Long].head()
    // appended batch: shifted copies of the first 20 vectors with ids
    // above the watermark (fresh but correlated content, like real
    // arrivals), same physical schema
    val newRows = emb0.filter($"vec_id" < 20)
      .select(($"vec_id" + lit(maxId + 1)).as("vec_id"),
        transform($"embedding", x => x + lit(0.25f)).as("embedding"),
        $"label")
    val snapDir = Files.createTempDirectory("graft-ann-snap").toString
    val unionDir = Files.createTempDirectory("graft-ann-union").toString
    emb0.write.parquet(s"$snapDir/embeddings.parquet")
    emb0.unionByName(newRows).write.parquet(s"$unionDir/embeddings.parquet")

    val whInc = Files.createTempDirectory("graft-ann-inc").toString
    val inc = new AnnIndexPipeline(spark, whInc)
    val r0 = inc.run(snapDir)
    val preCodes = tableRows(s"$whInc/ann_codes")
    val rInc = inc.runIncremental(unionDir)

    val whFull = Files.createTempDirectory("graft-ann-full").toString
    val rFull = new AnnIndexPipeline(spark, whFull).run(unionDir)

    assert(rInc == rFull)
    for (t <- Seq("ann_coarse_codebook", "ann_pq_codebook", "ann_codes"))
      assert(tableRows(s"$whInc/$t") == tableRows(s"$whFull/$t"), t)

    // the append is additive: every pre-existing code row survives
    // byte-identical, and exactly IvfPqM new rows per appended vector
    // landed
    import graft.models.SimilarityModels.{IvfPqCells, IvfPqM, IvfPqResidualK}
    val postCodes = tableRows(s"$whInc/ann_codes")
    assert(preCodes.toSet.subsetOf(postCodes.toSet))
    assert(postCodes.size == preCodes.size + 20 * IvfPqM)
    assert(rInc.codedVectors == r0.codedVectors + 20)

    // appended rows: codes within the residual codebook, cells from
    // the frozen coarse codebook
    val appended = spark.read.parquet(s"$whInc/ann_codes")
      .filter($"vec_id" > maxId)
    assert(appended.filter($"code" < 0 ||
      $"code" > IvfPqResidualK - 1).count() == 0)
    assert(appended.filter($"cell" < 0 ||
      $"cell" > IvfPqCells - 1).count() == 0)

    // frozen-codebook contract: the incremental run left both codebook
    // tables untouched (the union's deterministic derivation re-selects
    // the snapshot's source vectors, so full-rebuild matches too)
    assert(rInc.codebookCells ==
      graft.models.SimilarityModels.IvfPqCells.toLong &&
      rInc.pqCentroids == IvfPqM.toLong * IvfPqResidualK)
  }

  test("incremental over an empty index encodes without throwing (null watermark)") {
    // a run() over an empty snapshot leaves ann_codes empty; the
    // incremental watermark must read as "encode everything", not NPE
    val emptyDir = Files.createTempDirectory("graft-ann-empty").toString
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(org.apache.spark.sql.functions.lit(false))
      .write.parquet(s"$emptyDir/embeddings.parquet")
    val wh = Files.createTempDirectory("graft-ann-wh0").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    val r0 = pipe.run(emptyDir)
    assert(r0.codedVectors == 0 && r0.codebookCells == 0)
    // catch-up over real data: must not throw; with EMPTY frozen
    // codebooks nothing can encode (the drift signal for a fresh run())
    val r1 = pipe.runIncremental(sfDir)
    assert(r1.codedVectors == 0)
  }

  test("search over the materialized index ≡ the s06 inline derivation") {
    val wh = Files.createTempDirectory("graft-ann-search").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(sfDir)
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" < 10)
    val served = pipe.search(queries, k = 5)
      .select($"query_id", $"cand_id", $"cell",
        $"ivfpq_sim".cast("string"), $"sim_rank")
      .collect().map(_.mkString("|")).sorted.toSeq
    val inline = graft.models.SimilarityModels.ivfPqAnnTopK(spark, sfDir)
      .select($"query_id", $"cand_id", $"cell",
        $"ivfpq_sim".cast("string"), $"sim_rank")
      .collect().map(_.mkString("|")).sorted.toSeq
    assert(served.nonEmpty && served == inline)

    // the query-time nprobe knob (FAISS serving convention): a wider
    // probe scores a SUPERSET of candidates, so per-query the top ADC
    // similarity is monotonically non-decreasing in probe width, k
    // stays filled, and the full-width search (all cells) bounds both
    import graft.models.SimilarityModels.{IvfPqCells, IvfPqNprobe}
    def top1(nprobe: Int): Map[Long, BigDecimal] =
      pipe.search(queries, k = 5, nprobe = nprobe)
        .filter($"sim_rank" === 1)
        .select($"query_id", $"ivfpq_sim")
        .as[(Long, BigDecimal)].collect().toMap
    val narrow = top1(2)
    val default = top1(IvfPqNprobe)
    val full = top1(IvfPqCells)
    assert(default.keySet == narrow.keySet && full.keySet == narrow.keySet)
    narrow.keySet.foreach { q =>
      assert(narrow(q) <= default(q) && default(q) <= full(q),
        s"query $q: widening the probe must not lose the best " +
          s"candidate (${narrow(q)} / ${default(q)} / ${full(q)})")
    }
    val kFilled = pipe.search(queries, k = 5, nprobe = 2)
      .groupBy($"query_id").count().select($"count")
      .as[Long].collect()
    assert(kFilled.nonEmpty && kFilled.forall(_ == 5L),
      "k stays filled at the narrowest probe on this fixture")
  }

  test("driftReport: in-distribution appends stay fit-flat; out-of-cover vectors drop it") {
    import graft.models.SimilarityModels
    val wh = Files.createTempDirectory("graft-ann-drift").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(sfDir)

    def fits(dir: String): Map[String, (Long, Double)] =
      pipe.driftReport(dir)
        .select($"cohort", $"n_vectors", $"mean_fit")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val maxId = base.agg(max($"vec_id")).as[Long].head()
    val baseline = fits(sfDir)

    // IN-DISTRIBUTION appends: copies of existing corpus vectors under
    // new ids — same distribution the codebook trained on, so the
    // post-train cohort's mean fit stays in the train-sample cohort's
    // neighborhood (identical vectors score identical fits)
    val inDist = Files.createTempDirectory("graft-ann-indist").toString
    base.unionByName(
      base.filter($"vec_id" < 200)
        .select(($"vec_id" + maxId + 1).as("vec_id"), $"embedding",
          $"label"))
      .write.parquet(s"$inDist/embeddings.parquet")
    val rInDist = fits(inDist)

    // OUT-OF-COVER appends: the spec picks, with the model's OWN frozen
    // codebook, the unit one-hot directions the coarse cells cover
    // WORST — provably-poor-fit vectors, the drift a frozen index
    // cannot serve well
    val cents = spark.read.parquet(s"$wh/ann_coarse_codebook")
      .select($"cv", $"cnorm").as[(Seq[Double], Double)].collect()
    val dim = cents.head._1.size
    val worstDims = (0 until dim).sortBy { j =>
      cents.map { case (cv, n) => math.abs(cv(j)) / n }.max
    }.take(32)
    val crafted = Seq.tabulate(256) { i =>
      val j = worstDims(i % worstDims.size)
      (maxId + 1 + i.toLong,
        Array.tabulate(dim)(d => if (d == j) 1.0f else 0.0f).toSeq, 0)
    }
    val shifted = Files.createTempDirectory("graft-ann-shift").toString
    base.unionByName(
      crafted.toDF("vec_id", "embedding", "label")
        .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
          $"label"))
      .write.parquet(s"$shifted/embeddings.parquet")
    val rShift = fits(shifted)

    assert(baseline.contains("train_sample") && rInDist.contains("post_train"))
    val trainFit = rInDist("train_sample")._2
    val inDistFit = rInDist("post_train")._2
    // the shifted warehouse's post-train cohort = snapshot tail + the
    // crafted vectors; the in-distribution warehouse's is the fair
    // comparison arm (same tail, benign appends)
    val shiftFit = rShift("post_train")._2
    assert(rShift("post_train")._1 ==
      baseline.get("post_train").map(_._1).getOrElse(0L) + 256,
      "every crafted vector must land in the post-train cohort")
    assert(inDistFit > shiftFit,
      s"out-of-cover appends must read as drift: in-dist $inDistFit " +
        s"vs shifted $shiftFit (train $trainFit)")
    assert(math.abs(inDistFit - trainFit) <
      math.abs(shiftFit - trainFit),
      "the shifted cohort must sit farther from the train-sample fit")
  }
}
