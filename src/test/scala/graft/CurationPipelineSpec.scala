package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.CurationPipeline

/** End-to-end curated-corpus build on sf0.001: stage consistency,
  * packing over the kept set only, and run-to-run determinism (the
  * property that makes a training-data build reproducible).
  */
class CurationPipelineSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("funnel → corpus → packing composes consistently and is deterministic") {
    val wh = Files.createTempDirectory("graft-curation-pipe").toString
    val pipe = new CurationPipeline(spark, wh)
    val r1 = pipe.run(sfDir)
    // verdicts partition the snapshot
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(r1.verdictCounts.values.sum == total)
    // the curated corpus is exactly the kept set, and packing indexes
    // exactly the curated corpus
    assert(r1.curatedRows == r1.verdictCounts("kept"))
    assert(r1.packedRows == r1.curatedRows)
    // packed offsets are contiguous per (lang, shard) stream over the
    // CURATED corpus (positions in the training stream, no raw-id gaps)
    val packed = spark.read.parquet(s"$wh/curated_packing")
    val gaps = packed
      .withColumn("prev_end", lag($"start_offset" + $"n_tokens", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang", $"shard").orderBy($"doc_id")))
      .filter($"prev_end".isNotNull && $"prev_end" =!= $"start_offset")
    assert(gaps.count() == 0)
    // determinism: a second run over the same input reproduces the
    // exact same tables
    val funnel1 = spark.read.parquet(s"$wh/curation_funnel").collect().toSet
    val packed1 = packed.collect().toSet
    val r2 = pipe.run(sfDir)
    assert(r2 == r1)
    assert(spark.read.parquet(s"$wh/curation_funnel").collect().toSet
      == funnel1)
    assert(spark.read.parquet(s"$wh/curated_packing").collect().toSet
      == packed1)
  }
}
