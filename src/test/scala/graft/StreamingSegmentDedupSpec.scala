package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.DedupModels
import graft.runner.CurationPipeline
import graft.streaming.StreamingSegmentDedup

/** The streamed segment-dedup catch-up must reproduce the batch
  * incremental's verdict: the set of NEW keeper hashes appended for an
  * arrived document batch is identical, historical hashes never
  * re-keep, and every new segment is accounted for exactly once.
  */
class StreamingSegmentDedupSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed catch-up keeps exactly the batch incremental's new keeper hashes") {
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs0.agg(max($"doc_id")).as[Long].head()

    // appended batch: a verbatim copy of an old doc (every segment
    // historically known), a fresh doc, and an intra-batch duplicate
    // pair (its segments must keep ONCE)
    val oldText = docs0.filter($"doc_id" === 3)
      .select($"text").head().getString(0)
    val fresh = "one two three four five six seven eight nine ten " +
      "eleven twelve thirteen fourteen fifteen sixteen seventeen " +
      "eighteen nineteen twenty"
    val newRows = Seq(
      (maxId + 1, oldText, "fr", "src1"),
      (maxId + 2, fresh, "fr", "src2"),
      (maxId + 3, fresh + " twentyone", "fr", "src3"),
      (maxId + 4, fresh + " twentyone", "fr", "src4"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))

    val snapDir = Files.createTempDirectory("graft-ssd-snap").toString
    val unionDir = Files.createTempDirectory("graft-ssd-union").toString
    val newDir = Files.createTempDirectory("graft-ssd-new").toString
    docs0.write.parquet(s"$snapDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, snapDir)
    docs0.unionByName(newRows).write.parquet(s"$unionDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, unionDir)
    newRows.write.mode("overwrite").parquet(newDir)

    // batch path: full snapshot run, freeze the pre-incremental keeper
    // table, then the real incremental catch-up
    val wh = Files.createTempDirectory("graft-ssd-wh").toString
    val pipe = new CurationPipeline(spark, wh)
    pipe.run(snapDir)
    val preKeepersDir = Files.createTempDirectory("graft-ssd-pre").toString
    spark.read.parquet(s"$wh/curation_segments")
      .write.mode("overwrite").parquet(preKeepersDir)
    val preKeepers = spark.read.parquet(preKeepersDir)
    pipe.runIncremental(unionDir)
    val batchNew = spark.read.parquet(s"$wh/curation_segments")
      .filter($"doc_id" > maxId)
    val batchHashes = batchNew.select($"seg_hash").as[String]
      .collect().toSet

    // streamed path over the SAME arrived files, deduped against the
    // SAME frozen keeper table
    val ckpt = Files.createTempDirectory("graft-ssd-ckpt").toString
    val out = Files.createTempDirectory("graft-ssd-out").toString
    val q = StreamingSegmentDedup.runAvailableNow(
      spark, newDir, preKeepers, ckpt, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val streamedHashes = streamed.select($"seg_hash").as[String]
      .collect().toSet

    assert(streamedHashes.nonEmpty)
    assert(streamedHashes == batchHashes,
      s"streamed keepers diverge from batch: only-streamed=" +
        s"${(streamedHashes -- batchHashes).take(3)}, only-batch=" +
        s"${(batchHashes -- streamedHashes).take(3)}")
    // one keeper row per hash, all from the arrived batch
    assert(streamed.count() == streamedHashes.size)
    assert(streamed.filter($"doc_id" <= maxId).count() == 0)
    // no streamed keeper collides with history
    assert(streamed.join(preKeepers, Seq("seg_hash"), "left_semi")
      .count() == 0)

    // completeness: every arrived segment is historically known, a new
    // keeper, or an intra-batch duplicate of a new keeper
    val arrived = DedupModels.segmentsOf(spark.read.parquet(newDir))
    val unaccounted = arrived
      .join(preKeepers.select($"seg_hash"), Seq("seg_hash"), "left_anti")
      .join(streamed.select($"seg_hash"), Seq("seg_hash"), "left_anti")
    assert(unaccounted.count() == 0)

    // the verbatim-copy doc contributed no new keepers; the duplicate
    // pair's shared segments kept exactly once (hash-set semantics)
    assert(streamed.filter($"doc_id" === maxId + 1).count() == 0)
  }
}
