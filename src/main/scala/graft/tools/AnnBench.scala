package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.models.SimilarityModels

/** Dev bench for the ANN family's quality/latency trade: every
  * approximate tier (s02 LSH is a bucket histogram, so the rankers
  * s03/s04/s05/s06) measured against the exact brute-force baseline
  * (s01) on recall@k and steady-state seconds — the "measure, don't
  * guess" companion to the architecture scaladocs, re-runnable at any
  * SF via SPARK_GRAFT_SF_DIR. Writes bench_runs/ann_bench.json.
  *
  * Fixture context (also in the s03 scaladoc): the synthetic embeddings
  * are near-isotropic, which flatters data-point quantizers and caps
  * what trained k-means can show on recall here; the trained books'
  * measured win is quantization error (spec-pinned) and index size.
  */
object AnnBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.create(s"local[$cpus]", cpus.toInt, "graft-annbench")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000L).selectExpr("sum(id)").collect() // warmup

    def pairs(name: String): (Set[(Long, Long)], Double) = {
      val fn = graft.SparkEntry.queries(name)
      def run() = fn(spark, sfDir)
        .select($"query_id", $"cand_id").as[(Long, Long)].collect()
      run() // first run pays one-time materializations
      val t0 = System.nanoTime()
      val rows = run()
      ((System.nanoTime() - t0) / 1e9, rows.toSet) match {
        case (dt, s) => (s, dt)
      }
    }

    val (exact5, tExact) = pairs("s01_cosine_topk")
    // s03 returns top-3; its baseline is the exact top-3 subset
    val exact3 = {
      val fn = graft.SparkEntry.queries("s01_cosine_topk")
      fn(spark, sfDir).filter($"sim_rank" <= 3)
        .select($"query_id", $"cand_id").as[(Long, Long)].collect().toSet
    }
    val tiers = Seq(
      ("s03_ivf_ann_topk", exact3),
      ("s04_sq8_ann_topk", exact5),
      ("s05_pq_ann_topk", exact5),
      ("s06_ivfpq_ann_topk", exact5),
      ("s07_ivfpq_refined_topk", exact5))
    val rows = tiers.map { case (name, baseline) =>
      val (got, dt) = pairs(name)
      val recall = (got & baseline).size.toDouble / baseline.size
      println(f"[ann-bench] $name%-22s recall@k ${recall}%5.2f   ${dt}%6.2f s (steady)")
      (name, recall, dt)
    }
    println(f"[ann-bench] s01_cosine_topk (exact)        1.00   ${tExact}%6.2f s")
    val json = rows.map { case (n, r, t) =>
      s""""$n":{"recall":${f"$r%.3f"},"sec":${f"$t%.3f"}}"""
    }.mkString("{", ",",
      s""","s01_cosine_topk":{"recall":1.0,"sec":${f"$tExact%.3f"}},"sf":"$sfDir"}""")
    println(s"[ann-bench] $json")
    try {
      val dir = java.nio.file.Paths.get("bench_runs")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("ann_bench.json"), json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[ann-bench] could not write: $e")
    }
    spark.stop()
  }
}
