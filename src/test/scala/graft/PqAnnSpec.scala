package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.models.SimilarityModels

/** PQ is the coarsest quantizer in the ANN family (4 bits per
  * subvector vs SQ8's 8 bits per dim), so its contract is different
  * from s04's tight error band: the driver-side oracle pins
  * cross-engine determinism; this spec pins that the approximation
  * still RANKS usefully — the PQ top-5 must recover a meaningful share
  * of the exact top-5 — and that the code table really is the 64×
  * compression it claims (8 codes per vector, each inside the 4-bit
  * codebook range).
  */
class PqAnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("PQ top-5 overlaps the exact top-5 (recall@5 well above chance)") {
    val exact = SimilarityModels.cosineTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    val pq = SimilarityModels.pqAnnTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 50 && pq.size == 50)
    val recall = (exact & pq).size.toDouble / exact.size
    // 16 centroids per subspace is a deliberately tiny codebook; with
    // ~600 corpus vectors, chance recall@5 is ~0.8%. Requiring ≥ 20%
    // proves the quantizer preserves real neighborhood structure while
    // staying robust to the fixture's RNG.
    assert(recall >= 0.2, s"recall@5 = $recall")
  }

  test("the code table is PqM codes per vector, each a valid centroid id") {
    import SimilarityModels.{PqK, PqM, PqSub}
    val emb = graft.catalog.Tables.embeddings(spark, sfDir)
    val n = emb.count()
    // re-derive the code table exactly as the model does (subspace
    // slice → nearest TRAINED centroid) via the published query's own
    // helpers, and pin its shape invariants
    import org.apache.spark.sql.functions._
    val subs = SimilarityModels.doubledEmb(emb)
      .select($"vec_id",
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), $"v")
      .select($"vec_id", $"m",
        slice($"v", $"m" * PqSub + 1, lit(PqSub)).as("sub"))
    val cents = SimilarityModels.pqCodebook(subs)
    val l2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0d), (acc, v) => acc + v)
    val codes = subs.join(broadcast(cents), Seq("m"))
      .withColumn("d2", l2($"sub", $"cent"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id", $"m").orderBy(round($"d2", 6), $"cid")))
      .filter($"rk" === 1)
      .select($"vec_id", $"m", $"cid".as("code"), $"d2")
    assert(codes.count() === n * PqM)
    val badCodes = codes.filter($"code" < 0 || $"code" > PqK - 1).count()
    assert(badCodes === 0)
    // the codebook is the promised PqM subspaces × PqK centroids
    assert(cents.count() === PqM.toLong * PqK)

    // Lloyd's defining property: the trained codebook's quantization
    // error must beat the deterministic seeds it started from
    val seeds = subs.filter($"vec_id" < PqK)
      .select($"m", $"vec_id".as("cid"), $"sub".as("cent"))
    def sse(book: org.apache.spark.sql.DataFrame): Double =
      subs.join(broadcast(book), Seq("m"))
        .withColumn("d2", round(l2($"sub", $"cent"), 6))
        .groupBy($"vec_id", $"m").agg(min($"d2").as("best"))
        .agg(sum($"best")).as[Double].head()
    val (sseTrained, sseSeeds) = (sse(cents), sse(seeds))
    assert(sseTrained < sseSeeds,
      s"trained SSE $sseTrained did not improve on seed SSE $sseSeeds")
  }
}
