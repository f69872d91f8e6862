package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.models.SimilarityModels

/** The SQ8 path is an approximation with a hard per-dimension error
  * bound (half a quantization step); its ranking must stay close to the
  * exact brute-force baseline. Both properties are pinned here — the
  * oracle (driver gate) checks cross-engine determinism, this spec
  * checks the approximation is a GOOD one.
  */
class Sq8AnnSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  test("SQ8 top-5 recalls the exact top-5 (recall@5 ≥ 0.8 over queries)") {
    val exact = SimilarityModels.cosineTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    val sq8 = SimilarityModels.sq8AnnTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 50 && sq8.size == 50)
    val recall = (exact & sq8).size.toDouble / exact.size
    // 8 bits/dim over a 64-dim corpus: near-lossless ranking; anything
    // below this means the quantizer (not the data) is broken
    assert(recall >= 0.8, s"recall@5 = $recall")
  }

  test("SQ8 similarities sit within a tight band of the exact cosine") {
    val exact = SimilarityModels.cosineTopK(spark, sfDir)
      .select($"query_id", $"cand_id", $"cosine_sim".cast("double"))
      .as[(Long, Long, Double)].collect()
      .map { case (q, c, s) => (q, c) -> s }.toMap
    val sq8 = SimilarityModels.sq8AnnTopK(spark, sfDir)
      .select($"query_id", $"cand_id", $"cosine_sim_sq8".cast("double"))
      .as[(Long, Long, Double)].collect()
    val deltas = sq8.flatMap { case (q, c, s) =>
      exact.get((q, c)).map(e => math.abs(s - e))
    }
    assert(deltas.nonEmpty)
    // half-step dequantization error per dim → sub-1% cosine shift
    assert(deltas.max < 0.01, s"max |sq8 − exact| = ${deltas.max}")
  }
}
