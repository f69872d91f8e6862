package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.SimilarityModels

/** d09 SemDeDup semantics: the within-cell keep-first drop rule on a
  * corpus with a KNOWN planted duplicate, plus the per-cell accounting
  * invariants on the real fixture. The DuckDB oracle proves the Spark
  * build and SQL replay agree; this spec proves the agreed-on answer
  * MEANS semantic dedup (the planted rephrasing-pair is found, exactly
  * one survivor, nothing else dropped).
  */
class SemanticDedupSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** 20 one-hot 64-dim vectors; ids 17 and 19 are IDENTICAL (both
    * basis-17), every other pair is orthogonal (cosine 0). */
  private def plantedDir(): String = {
    val dir = Files.createTempDirectory("graft-semdedup").toString
    val rows = (0 until 20).map { i =>
      val dim = if (i == 19) 17 else i
      val v = Array.tabulate(64)(d => if (d == dim) 1.0f else 0.0f)
      (i.toLong, v, i % 3)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("planted identical pair: one survivor, the higher id dropped, nothing else") {
    val out = SimilarityModels.semanticDedup(spark, plantedDir())
      .select($"cell", $"n_members", $"n_dup_pairs", $"n_dropped",
        $"dropped_ids")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(out.map(_._2).sum == 20L, "every vector belongs to one cell")
    val dropRows = out.filter(_._4 > 0)
    assert(dropRows.length == 1, s"exactly one cell drops: ${out.toSeq}")
    val (_, _, dupPairs, dropped, ids) = dropRows.head
    assert(dupPairs == 1L && dropped == 1L && ids == "19",
      s"the planted duplicate (17,19) keeps 17 and drops 19: $ids")
  }

  test("fixture invariants: pair accounting and dropped-id lists are consistent") {
    val rows = SimilarityModels.semanticDedup(spark, "/root/testdata/sf0.001")
      .select($"cell", $"n_members", $"n_pairs", $"n_dup_pairs",
        $"n_dropped", $"dropped_ids")
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(rows.map(_._2).sum == 500L, "partition of the corpus")
    assert(rows.length <= 16, "at most k cells")
    for ((cell, m, p, dp, nd, ids) <- rows) {
      assert(p == m * (m - 1) / 2, s"cell $cell scores all within-cell pairs")
      assert(dp <= p && nd <= dp, s"cell $cell: drops <= dup pairs <= pairs")
      val listed = if (ids.isEmpty) 0 else ids.split(",").length
      assert(listed == nd, s"cell $cell lists exactly its drops")
    }
  }
}
