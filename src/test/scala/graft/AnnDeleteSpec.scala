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
    // re-ranking, not just absence); a fully-known batch reports zero
    // drops (round-13 review: delete observability)
    val victims = before.map(_._2).distinct.take(3)
    val delRep = pipe.runDelete(victims.toDF("vec_id"))
    assert(delRep.requestedDeletes == 3L && delRep.validatedDeletes == 3L
      && delRep.droppedUnknownDeletes == 0L, s"$delRep")

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
    // simulate a sweep killed after writing the tmp but before the
    // swap: the tmp is a dead duplicate subset
    val tmp = new java.io.File(s"$wh/.swap-ann_codes")
    spark.read.parquet(s"$wh/ann_codes").limit(5)
      .write.parquet(tmp.getAbsolutePath)
    val removed = pipe.compactDeletes()
    assert(!tmp.exists(), "crash residue must be cleared")
    assert(removed == graft.models.SimilarityModels.IvfPqM.toLong,
      "the real prune proceeds after recovery")
    assert(searchRows(pipe) == before, "recovery + prune keep results")
  }

  test("compaction crash mid-swap: the moved-aside old dir never loses live rows") {
    val wh = Files.createTempDirectory("graft-ann-del3").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(sfDir)
    pipe.runDelete(Seq(0L, 1L).toDF("vec_id"))
    val want = searchRows(pipe)
    val liveCount = spark.read.parquet(s"$wh/ann_codes")
      .join(spark.read.parquet(s"$wh/ann_tombstones").select($"vec_id"),
        Seq("vec_id"), "left_anti").count()
    // simulate the state between the two renames: live rows written to
    // the tmp, old dir moved aside, nothing at ann_codes — the state
    // the round-12 review showed the old file-wise prune LOST rows in
    val root = new java.io.File(s"$wh/ann_codes")
    val tmpNew = new java.io.File(s"$wh/.swap-ann_codes")
    val tmpOld = new java.io.File(s"$wh/.swap-ann_codes-old")
    spark.read.parquet(root.getAbsolutePath)
      .join(spark.read.parquet(s"$wh/ann_tombstones").select($"vec_id"),
        Seq("vec_id"), "left_anti")
      .write.parquet(tmpNew.getAbsolutePath)
    assert(root.renameTo(tmpOld))
    val removed = pipe.compactDeletes()
    assert(removed == 0L, "recovery finished the pending swap; the " +
      "fresh prune then found nothing left to remove")
    assert(!tmpNew.exists() && !tmpOld.exists(), "residue cleared")
    assert(spark.read.parquet(s"$wh/ann_codes").count() == liveCount,
      "every live row survives the mid-swap crash")
    assert(searchRows(pipe) == want, "results unchanged through recovery")

    // post-swap residue (old dir not yet deleted) also clears
    spark.read.parquet(s"$wh/ann_codes").limit(3)
      .write.parquet(tmpOld.getAbsolutePath)
    pipe.compactDeletes()
    assert(!tmpOld.exists(), "post-swap residue cleared")
    assert(searchRows(pipe) == want)
  }

  test("a mid-swap crash on the tombstone LOG never reads as empty") {
    // compactDeletes folds ann_tombstones via SwapWrite; a crash
    // between its two renames leaves the dir ABSENT with the only copy
    // in the .swap- sibling. The accessor's missing→empty bootstrap
    // fallback must NOT win over recovery (round-13 high finding) —
    // deleted vectors would silently become searchable again
    val wh = Files.createTempDirectory("graft-ann-del5").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    pipe.run(sfDir)
    val victims = searchRows(pipe).map(_._2).distinct.take(2)
    pipe.runDelete(victims.toDF("vec_id"))
    val want = searchRows(pipe)
    assert(new java.io.File(s"$wh/ann_tombstones")
      .renameTo(new java.io.File(s"$wh/.swap-ann_tombstones")))
    assert(searchRows(pipe) == want,
      "search must recover the mid-swap log before masking")
    assert(new java.io.File(s"$wh/ann_tombstones").exists(),
      "recovery must restore the log dir")
    assert(searchRows(pipe).map(_._2).toSet
      .intersect(victims.toSet).isEmpty, "victims stay dead")
  }

  test("deleting an unknown id does not advance the append watermark") {
    val wh = Files.createTempDirectory("graft-ann-del4").toString
    val pipe = new AnnIndexPipeline(spark, wh)
    // index only the low half of the corpus, then "fat-finger" a delete
    // of an id far above anything coded
    val all = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val cut = all.agg(expr("percentile(vec_id, 0.5)")).head().getDouble(0)
    val half = Files.createTempDirectory("graft-ann-half").toString
    all.filter($"vec_id" <= cut).write.parquet(s"$half/embeddings.parquet")
    pipe.run(half)
    val rep = pipe.runDelete(
      Seq(Long.MaxValue - 1, 999999999L).toDF("vec_id"))
    assert(!new java.io.File(s"$wh/ann_tombstones").exists() ||
      spark.read.parquet(s"$wh/ann_tombstones").count() == 0,
      "unknown ids must not enter the log")
    // ...but the drop is VISIBLE (round-13 review): the all-unknown
    // batch reports exactly what it discarded
    assert(rep.requestedDeletes == 2L && rep.validatedDeletes == 0L &&
      rep.droppedUnknownDeletes == 2L, s"$rep")
    // the upper half arrives later: catch-up must still encode it
    val r = pipe.runIncremental(sfDir)
    assert(r.codedVectors == all.count(),
      "later-arriving vectors must not be skipped by a bogus watermark")
  }
}
