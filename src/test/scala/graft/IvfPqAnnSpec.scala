package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.models.SimilarityModels

/** s06 IVF-PQ: the composed tier must inherit BOTH parents' contracts —
  * IVF's scan pruning (every candidate comes from one of the query's two
  * probed cells) and PQ's ranking usefulness (recall@5 against the exact
  * brute-force top-5 well above chance), plus the residual-coding
  * identity that distinguishes IVF-PQ from IVF-then-PQ: a vector that IS
  * a residual-codebook source must code to itself.
  */
class IvfPqAnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("IVF-PQ top-5 recovers a meaningful share of the exact top-5") {
    val exact = SimilarityModels.cosineTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    val got = SimilarityModels.ivfPqAnnTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 50 && got.size == 50)
    val recall = (exact & got).size.toDouble / exact.size
    // the composed index prunes 14/16 cells AND quantizes to 4 bytes;
    // chance recall@5 is <1% on the ~600-vector fixture. ≥15% proves
    // real neighborhood structure survives both approximations.
    assert(recall >= 0.15, s"recall@5 = $recall")
  }

  test("every candidate lies in one of the query's two probed cells") {
    // re-derive the probe set with the model's own deterministic coarse
    // quantizer (16 lowest-vec_id centroids, rounded cosine, tie by cid)
    val dotA = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val base = graft.catalog.Tables.embeddings(spark, sfDir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dotA($"v", $"v")))
    val cents = base.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"norm".as("cnorm"))
    val ranked = base.crossJoin(broadcast(cents))
      .withColumn("cell_sim", round(dotA($"v", $"cv") / ($"norm" * $"cnorm"), 6))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"cell_sim".desc, $"cid")))
    val probed = ranked.filter($"vec_id" < 10 && $"crk" <= 2)
      .select($"vec_id".as("query_id"), $"cid".as("cell"))
      .as[(Long, Long)].collect().toSet
    val out = SimilarityModels.ivfPqAnnTopK(spark, sfDir)
      .select($"query_id", $"cell").as[(Long, Long)].collect()
    assert(out.nonEmpty)
    val stray = out.filterNot(probed.contains)
    assert(stray.isEmpty, s"candidates outside the probe set: ${stray.take(5).toSeq}")
  }

  test("residual-codebook sources code to themselves (residual identity)") {
    // vec_ids 16..31 donate the residual codebook; each of their residual
    // subvectors is centroid pcid = vec_id - 16, so nearest-centroid
    // coding must return exactly that id (distance 0, tie rank 1 only if
    // the coding really runs on residuals, not raw subvectors).
    val dotA = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val base = graft.catalog.Tables.embeddings(spark, sfDir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(dotA($"v", $"v")))
    val cents = base.filter($"vec_id" < 16)
      .select($"vec_id".as("cid"), $"v".as("cv"), $"norm".as("cnorm"))
    val assigned = base.crossJoin(broadcast(cents))
      .withColumn("cell_sim", round(dotA($"v", $"cv") / ($"norm" * $"cnorm"), 6))
      .withColumn("crk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id").orderBy($"cell_sim".desc, $"cid")))
      .filter($"crk" === 1)
      .select($"vec_id", $"cid", $"v")
      .join(broadcast(cents), Seq("cid"))
      .select($"vec_id", zip_with($"v", $"cv", (x, y) => x - y).as("r"))
    val rsubs = assigned
      .select($"vec_id", explode(sequence(lit(0), lit(7))).as("m"), $"r")
      .select($"vec_id", $"m", slice($"r", $"m" * 8 + 1, lit(8)).as("rsub"))
    val pqCents = rsubs.filter($"vec_id" >= 16 && $"vec_id" < 32)
      .select(($"vec_id" - 16).as("pcid"), $"m", $"rsub".as("pcent"))
    val l2 = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)
    val codes = rsubs.join(broadcast(pqCents), Seq("m"))
      .withColumn("dist", round(l2($"rsub", $"pcent"), 6))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id", $"m").orderBy($"dist", $"pcid")))
      .filter($"rk" === 1)
    val selfMiss = codes
      .filter($"vec_id" >= 16 && $"vec_id" < 32 &&
        $"pcid" =!= ($"vec_id" - 16)).count()
    assert(selfMiss === 0, "a residual-codebook source did not code to itself")
  }
}
