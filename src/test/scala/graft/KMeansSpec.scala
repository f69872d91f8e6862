package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.models.KMeans

/** The deterministic Lloyd trainer behind every ANN codebook: seeds,
  * assignment ties, exact integer-unit means, empty-cluster
  * carry-forward, and run-to-run determinism. Cross-engine parity of
  * the generated oracle CTEs is pinned end-to-end by the driver's
  * DuckDB compare on s03/s05/s06.
  */
class KMeansSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def pts(rows: (Int, Long, Seq[Double])*) =
    rows.toSeq.toDF("grp", "id", "v")

  test("two runs over the same points produce identical centroids") {
    val base = graft.catalog.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val p = graft.models.SimilarityModels.doubledEmb(base)
      .select(lit(0).as("grp"), $"vec_id".as("id"), $"v")
    def snap() = KMeans.lloyd(p, 16, 2, cosine = true)
      .select($"cid", $"cv".cast("string"), $"cnorm".cast("string"))
      .collect().map(_.mkString("|")).sorted.toSeq
    val (a, b) = (snap(), snap())
    assert(a.size == 16 && a == b)
  }

  test("means are exact integer-unit averages (hand-computed 1-cluster case)") {
    // k=1 → every point joins cluster 0; the centroid must be the
    // truncating integer-unit mean, not a float average
    val p = pts((0, 0L, Seq(0.1, 0.2)), (0, 1L, Seq(0.3, 0.6)),
      (0, 2L, Seq(0.2, 0.1)))
    val cv = KMeans.lloyd(p, 1, 1, cosine = false)
      .select($"cv").as[Seq[Double]].head()
    // units: (x+16)*1e7 rounded; mean = (Σu div 3)/1e7 − 16
    def mean(xs: Seq[Double]): Double = {
      val units = xs.map(x => math.round((x + 16.0) * 1e7))
      units.sum / 3 / 1e7 - 16.0
    }
    assert(cv == Seq(mean(Seq(0.1, 0.3, 0.2)), mean(Seq(0.2, 0.6, 0.1))))
  }

  test("an emptied cluster keeps its previous centroid") {
    // id1 duplicates id0: both assign to cid 0 (tie broken by cid), so
    // cluster 1 is empty from iteration 1 and must carry its seed
    val p = pts((0, 0L, Seq(1.0, 2.0)), (0, 1L, Seq(1.0, 2.0)),
      (0, 2L, Seq(1.0, 2.0)))
    val cents = KMeans.lloyd(p, 2, 2, cosine = false)
      .select($"cid", $"cv").as[(Long, Seq[Double])].collect().toMap
    assert(cents.keySet == Set(0L, 1L))
    assert(cents(1L).zip(Seq(1.0, 2.0)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }

  test("groups train independently (per-subspace codebooks)") {
    val p = pts(
      (0, 0L, Seq(0.0, 0.0)), (0, 1L, Seq(1.0, 1.0)), (0, 5L, Seq(0.9, 1.1)),
      (1, 0L, Seq(-1.0, 0.0)), (1, 1L, Seq(2.0, 2.0)), (1, 7L, Seq(-0.8, 0.1)))
    val cents = KMeans.lloyd(p, 2, 2, cosine = false)
    assert(cents.groupBy($"grp").count().as[(Int, Long)].collect().toMap ==
      Map(0 -> 2L, 1 -> 2L))
    // group 1's cid-0 centroid pulled toward its own group's points
    val g1c0 = cents.filter($"grp" === 1 && $"cid" === 0)
      .select($"cv").as[Seq[Double]].head()
    assert(g1c0.head < -0.5, s"group-1 centroid contaminated: $g1c0")
  }

  test("the oracle generator unrolls the requested iterations and metric") {
    val cos = KMeans.oracleCtes("k", "k_train", 16, 2, 64, cosine = true)
    val l2 = KMeans.oracleCtes("k", "k_train", 16, 2, 8, cosine = false)
    assert(cos.contains("k_cents0") && cos.contains("k_asn2") &&
      cos.contains("k_cents AS"))
    assert(cos.contains("DESC") && !l2.contains("DESC"))
    assert(l2.contains("range(8)") && cos.contains("range(64)"))
    // exact-mean arithmetic is spliced, not float averages
    assert(l2.contains("// n") && l2.contains("10000000.0"))
  }
}
