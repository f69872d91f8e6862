package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{DedupModels, SimilarityModels}

/** d13 containment-tier and s11 recall-audit semantics.
  *
  * The d13 fixture is md5-searched so its LSH bands genuinely collide
  * (doc 1 = doc 0 + 22 appended filler tokens keeps both of doc 0's
  * band minima): Jaccard = 18/40 = 0.45 sits UNDER the d07 edge
  * threshold while containment = 18/18 = 1.0 — exactly the asymmetric
  * superset case the tier exists for.
  */
class ContainRecallSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-d13").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d13: a Jaccard-missed superset pair fires the containment tier") {
    val a = (0 until 20).map(i => s"alpha$i").mkString(" ")
    val pad = (0 until 22).map(i => s"pad0x$i").mkString(" ")
    val dir = docsDir(Seq((0L, a), (1L, s"$a $pad")))
    // precondition: the pair is an LSH candidate but NOT a d07 edge
    val d03 = DedupModels.lshNearDupPairs(spark, dir)
      .select($"doc_a", $"doc_b", $"inter_count", $"union_count")
      .as[(Long, Long, Long, Long)].collect()
    assert(d03.toSeq == Seq((0L, 1L, 18L, 40L)),
      s"fixture must band-collide at J=18/40: ${d03.toSeq}")
    val out = DedupModels.containmentPairs(spark, dir)
      .select($"doc_a", $"doc_b", $"n_a", $"n_b",
        $"containment".cast("double"), $"is_asymmetric")
      .as[(Long, Long, Long, Long, Double, Boolean)].collect()
    assert(out.length == 1, out.toSeq)
    val r = out.head
    assert(r._1 == 0L && r._2 == 1L && r._3 == 18L && r._4 == 40L)
    assert(r._5 == 1.0, s"doc 0 is wholly contained: $r")
    assert(r._6, s"Jaccard 0.45 < 0.5 must mark the pair asymmetric: $r")
  }

  test("d13: exact duplicates contain fully but are NOT asymmetric") {
    val text = (0 until 20).map(i => s"dup$i").mkString(" ")
    val dir = docsDir(Seq((0L, text), (4L, text)))
    val out = DedupModels.containmentPairs(spark, dir)
      .select($"doc_a", $"doc_b", $"containment".cast("double"),
        $"is_asymmetric")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.toSeq == Seq((0L, 4L, 1.0, false)), out.toSeq)
  }

  test("s11: recall is the exact intersection ratio of the two rankings") {
    val sfDir = "/root/testdata/sf0.001"
    val exact = SimilarityModels.cosineTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val approx = SimilarityModels.ivfPqAnnTopK(spark, sfDir)
      .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    val out = SimilarityModels.recallAudit(spark, sfDir)
      .select($"query_id", $"n_exact", $"n_hits", $"recall".cast("double"))
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length == exact.size, "one audit row per query")
    out.foreach { case (q, nEx, nHits, recall) =>
      assert(nEx == exact(q).size.toLong)
      val expect = (exact(q) intersect approx.getOrElse(q, Set.empty)).size
      assert(nHits == expect.toLong, s"query $q hits")
      assert(math.abs(recall - expect.toDouble / nEx) < 1e-6,
        s"query $q recall")
    }
    // the trained index is not garbage: some query recalls something
    assert(out.map(_._3).sum > 0, "total hits must be positive")
  }
}
