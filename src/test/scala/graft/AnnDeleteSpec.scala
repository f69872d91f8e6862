package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.AnnIndexPipeline

/** Tombstone deletes on the materialized IVF-PQ index: a delete masks
  * at the very next search with k still filled (mask BEFORE ranking),
  * physical compaction changes storage but never results, the retained
  * delete log keeps the append watermark monotone (no resurrection),
  * and compaction crash residue resolves per the dot-tmp contract.
  */
class AnnDeleteSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def searchRows(pipe: AnnIndexPipeline): Seq[(Long, Long, Long)] = {
    val queries = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter($"vec_id" < 10)
    pipe.search(queries)
      .select($"query_id", $"cand_id", $"sim_rank")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
  }

  test("delete masks at next search with k still filled; compaction is invisible; no resurrection") {
    val wh = Files.createTempDirectory("graft-ann-del").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(sfDir)

    val before = searchRows(pipe)
    val nQueries = before.map(_._1).distinct.size
    assert(before.size == nQueries * 5, "k=5 filled per query pre-delete")

    // delete three vectors that currently appear in results (forces
    // re-ranking, not just absence)
    val victims = before.map(_._2).distinct.take(3)
    pipe.runDelete(victims.toDF("vec_id"))

    val after = searchRows(pipe)
    assert(after.map(_._2).toSet.intersect(victims.toSet).isEmpty,
      "deleted vectors must vanish from results")
    assert(after.size == nQueries * 5,
      "k must stay FILLED after deletes (mask before ranking)")
    assert(after != before, "results must re-rank, not truncate")

    // physical prune: rows leave storage, results do not change
    val codesBefore = spark.read.parquet(s"$wh/ann_codes").count()
    val removed = pipe.compactDeletes()
    assert(removed == victims.size.toLong * graft.models.SimilarityModels.IvfPqM,
      s"one code row per subspace per victim, got $removed")
    assert(spark.read.parquet(s"$wh/ann_codes").count() ==
      codesBefore - removed)
    assert(searchRows(pipe) == after, "compaction must not change results")
    // the log survives compaction (it carries the watermark)
    assert(spark.read.parquet(s"$wh/ann_tombstones").count() >= 3)

    // no resurrection: delete the HIGHEST coded id, prune it, then run
    // an incremental catch-up over the same corpus — the watermark must
    // honor the log, encode nothing, and keep the victim dead
    val maxId = spark.read.parquet(s"$wh/ann_codes")
      .agg(max($"vec_id")).as[Long].head()
    pipe.runDelete(Seq(maxId).toDF("vec_id"))
    pipe.compactDeletes()
    val r = pipe.runIncremental(sfDir)
    assert(!spark.read.parquet(s"$wh/ann_codes")
      .filter($"vec_id" === maxId).head(1).nonEmpty,
      "a pruned max id must not resurrect through the append watermark")
    assert(r.codedVectors == spark.read.parquet(s"$wh/ann_codes")
      .select($"vec_id").distinct().count())
  }

  test("compaction crash residue: a tmp left beside a live table is dropped") {
    val wh = Files.createTempDirectory("graft-ann-del2").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(sfDir)
    pipe.runDelete(Seq(0L).toDF("vec_id"))
    val before = searchRows(pipe)
    // simulate a sweep killed after writing the tmp but before the old
    // files were deleted: the tmp is a dead duplicate subset
    val tmp = new java.io.File(s"$wh/.delete-compact-ann_codes")
    spark.read.parquet(s"$wh/ann_codes").limit(5)
      .write.parquet(tmp.getAbsolutePath)
    val removed = pipe.compactDeletes()
    assert(!tmp.exists(), "crash residue must be cleared")
    assert(removed == graft.models.SimilarityModels.IvfPqM.toLong,
      "the real prune proceeds after recovery")
    assert(searchRows(pipe) == before, "recovery + prune keep results")
  }
}
