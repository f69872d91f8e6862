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

  private def tableRows(path: String): Seq[String] = {
    val df = spark.read.parquet(path)
    df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq
  }

  test("incremental run over appended docs ≡ one full run over the union") {
    val snapDir = Files.createTempDirectory("graft-cur-snap").toString
    val unionDir = Files.createTempDirectory("graft-cur-union").toString
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    docs0.write.parquet(s"$snapDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, snapDir)
    // appended batch: ids above every processed id, never eval-sourced,
    // hitting every verdict path
    val dupOfOld = docs0.filter($"doc_id" === 3)
      .select($"text").head().getString(0)
    val evalText = docs0.filter($"source" === "src0")
      .orderBy($"doc_id").select($"text").head().getString(0)
    val fresh = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violet umbrellas drift quietly past the harbor wall"
    val newRows = Seq(
      (500L, dupOfOld, "fr", "src1"), // joins an EXISTING dedup group
      (501L, fresh, "fr", "src2"), // unique → kept
      (502L, Seq.fill(30)("spam").mkString(" "), "fr", "src3"), // repetitive
      (503L, evalText + " zz yy xx ww vv", "fr", "src4"), // contaminated
      (504L, fresh + " and then some", "fr", "src5"), // founds a NEW group
      (505L, fresh + " and then some", "fr", "src6")) // its duplicate
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    docs0.unionByName(newRows).write.parquet(s"$unionDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, unionDir)

    // path A: snapshot + incremental catch-up
    val whInc = Files.createTempDirectory("graft-cur-inc").toString
    val inc = new CurationPipeline(spark, whInc)
    inc.run(snapDir)
    val rInc = inc.runIncremental(unionDir)
    // path B: one full run over the union
    val whFull = Files.createTempDirectory("graft-cur-full").toString
    val rFull = new CurationPipeline(spark, whFull).run(unionDir)

    assert(rInc == rFull)
    for (t <- Seq("curation_funnel", "curated_corpus/documents.parquet",
        "curation_splits", "curated_packing", "train_split_packing",
        "span_trimmed_corpus/documents.parquet", "curation_span_grams",
        "segment_stats", "curation_segments"))
      assert(tableRows(s"$whInc/$t") == tableRows(s"$whFull/$t"), t)

    // span-trim catch-up: docs 501 and 504 share a 19-token prefix
    // (> the 10-token window), both are kept, and 501 is the earlier
    // id — so the FULL prefix must be trimmed out of 504 while 501
    // survives untouched (first occurrence wins)
    val trimmed = graft.catalog.Tables
      .documents(spark, s"$whInc/span_trimmed_corpus")
      .filter($"doc_id".isin(501L, 504L))
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(trimmed(501L) == fresh, "first occurrence must keep its text")
    assert(trimmed(504L) == "and then some",
      "the duplicated prefix must be trimmed from the later copy")

    // each bloom sidecar an incremental run unions up is byte-identical
    // to the one a full rebuild writes (reproducible bitsets)
    def bloomMd5(wh: String, table: String): String = spark.read
      .parquet(s"$wh/$table")
      .select(md5($"bloom")).as[String].head()
    for (t <- Seq("curation_segment_bloom", "curation_span_bloom"))
      assert(bloomMd5(whInc, t) == bloomMd5(whFull, t),
        s"incremental $t sidecar diverged from the full rebuild's")

    // segment stage: the exact-duplicate append (doc 500 copies doc 3's
    // text, so every segment hash is already held by a snapshot keeper)
    // retains zero tokens, while the fresh doc 501 retains everything
    val segStats = spark.read.parquet(s"$whInc/segment_stats")
      .filter($"doc_id".isin(500L, 501L))
      .select($"doc_id", $"retained_ratio".cast("double"))
      .as[(Long, Double)].collect().toMap
    assert(segStats(500L) == 0.0, "duplicate text must retain nothing")
    assert(segStats(501L) == 1.0, "fresh text must retain everything")

    // the new batch exercised every verdict path as designed
    val v = spark.read.parquet(s"$whInc/curation_funnel")
      .filter($"doc_id" >= 500L)
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(v(500L) == "duplicate") // existing group, sticky canonical
    assert(v(501L) == "kept")
    assert(v(502L) == "repetitive")
    assert(v(503L) == "contaminated")
    assert(v(504L) == "kept") // founded the new group
    assert(v(505L) == "duplicate") // within-batch duplicate

    // COMPACTION: the incremental appends left small part files behind;
    // a compaction sweep must bound file counts WITHOUT changing a row
    // (the 128MB default dwarfs these KB tables ⇒ each folds to 1 file)
    val preCompact = Seq("curation_funnel", "curation_span_grams",
      "span_trimmed_corpus/documents.parquet", "segment_stats")
      .map(t => t -> tableRows(s"$whInc/$t")).toMap
    val compacted = inc.compact()
    assert(compacted.nonEmpty, "appends must leave something to compact")
    for ((t, rows) <- preCompact)
      assert(tableRows(s"$whInc/$t") == rows, s"compaction changed $t")
    for ((t, n) <- compacted) {
      val files = new java.io.File(s"$whInc/$t").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files == n && n == 1, s"$t not folded ($files files)")
    }

    // frozen-eval guard: a new eval-source doc must be rejected loudly
    val badDir = Files.createTempDirectory("graft-cur-bad").toString
    docs0.unionByName(Seq((600L, "new benchmark item", "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long")))
      .write.parquet(s"$badDir/documents.parquet")
    assertThrows[IllegalArgumentException] {
      inc.runIncremental(badDir)
    }
  }

  test("flat-dir compaction recovers an interrupted swap from either side") {
    import graft.runner.Compaction
    def freshDir(tag: String): String =
      Files.createTempDirectory(s"graft-compact-$tag").toString
    def rows(p: String): Set[Long] =
      spark.read.parquet(p).as[Long].collect().toSet
    def write(dir: String, vals: Range): Unit =
      vals.map(_.toLong).toDF("v").coalesce(1)
        .write.mode("append").parquet(dir)

    // normal fold: 4 appends → 4 files → 1 file, rows identical
    val d0 = freshDir("fold")
    for (i <- 0 until 4) write(d0, i * 10 until i * 10 + 10)
    val before = rows(d0)
    assert(Compaction.compactFlat(spark, d0).contains(1))
    assert(rows(d0) == before)
    assert(new java.io.File(d0).listFiles()
      .count(f => f.isFile && f.getName.endsWith(".parquet")) == 1)

    // branch (a): crash after the tmp write, BEFORE the swap — the tmp
    // is a dead duplicate and must be dropped; the live dir wins
    val dA = freshDir("pre-swap") + "/tbl"
    for (i <- 0 until 3) write(dA, i * 10 until i * 10 + 10)
    val liveA = rows(dA)
    val tmpA = new java.io.File(new java.io.File(dA).getParentFile,
      ".swap-tbl")
    spark.read.parquet(dA).coalesce(1)
      .write.mode("overwrite").parquet(tmpA.getAbsolutePath)
    assert(Compaction.compactFlat(spark, dA).contains(1))
    assert(rows(dA) == liveA)
    assert(!tmpA.exists())

    // branch (b): crash MID-SWAP (live dir moved aside, tmp not yet in
    // place) — the tmp holds the ONLY copy; recovery must finish the
    // swap forward before anything else
    val dB = freshDir("mid-swap") + "/tbl"
    for (i <- 0 until 3) write(dB, i * 10 until i * 10 + 10)
    val liveB = rows(dB)
    val parentB = new java.io.File(dB).getParentFile
    val tmpB = new java.io.File(parentB, ".swap-tbl")
    spark.read.parquet(dB).coalesce(1)
      .write.mode("overwrite").parquet(tmpB.getAbsolutePath)
    assert(new java.io.File(dB)
      .renameTo(new java.io.File(parentB, ".swap-tbl-old")))
    // recovery completes the fold; the dir is already within budget so
    // no FURTHER rewrite happens (None)
    assert(Compaction.compactFlat(spark, dB).isEmpty)
    assert(rows(dB) == liveB)
    assert(parentB.listFiles().map(_.getName).toSet == Set("tbl"))
  }

  test("legacy (pre-SwapWrite) compaction residue migrates: stranded tmp data restores") {
    import graft.runner.Compaction
    def rows(p: String): Set[Long] =
      spark.read.parquet(p).as[Long].collect().toSet
    def moveDataFiles(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      src.listFiles()
        .filter(f => f.isFile && (f.getName.endsWith(".parquet") ||
          f.getName.endsWith(".crc")))
        .foreach(f => assert(f.renameTo(new java.io.File(dst, f.getName))))
    }

    // old FLAT protocol, crash-after-delete: the table dir was emptied
    // and <dir>/.compact-flat holds the ONLY copy — an upgraded sweep
    // must finish the old move, not read the table as empty
    val d1 = Files.createTempDirectory("graft-legacy1").toString + "/tbl"
    (0L until 30L).toDF("v").coalesce(1).write.parquet(d1)
    val want1 = rows(d1)
    moveDataFiles(new java.io.File(d1), new java.io.File(d1, ".compact-flat"))
    Compaction.compactFlat(spark, d1)
    assert(rows(d1) == want1, "stranded legacy rows must restore")
    assert(!new java.io.File(d1, ".compact-flat").exists())

    // old ANN prune protocol, crash-after-delete: the SIBLING
    // .delete-compact-<name> dir holds the only copy
    val d2 = Files.createTempDirectory("graft-legacy2").toString + "/tbl"
    (100L until 140L).toDF("v").coalesce(1).write.parquet(d2)
    val want2 = rows(d2)
    val parent2 = new java.io.File(d2).getParentFile
    moveDataFiles(new java.io.File(d2),
      new java.io.File(parent2, ".delete-compact-tbl"))
    Compaction.migrateLegacyResidue(spark, d2)
    assert(rows(d2) == want2, "stranded sibling-tmp rows must restore")
    assert(!new java.io.File(parent2, ".delete-compact-tbl").exists())

    // crash-BEFORE-delete: the live dir still has data; the legacy tmp
    // is a dead duplicate and is dropped without touching the table
    val d3 = Files.createTempDirectory("graft-legacy3").toString + "/tbl"
    (200L until 220L).toDF("v").coalesce(1).write.parquet(d3)
    val want3 = rows(d3)
    spark.read.parquet(d3).limit(5).write
      .parquet(new java.io.File(d3, ".compact-flat").getAbsolutePath)
    Compaction.compactFlat(spark, d3)
    assert(rows(d3) == want3, "a dead-duplicate legacy tmp must not win")
    assert(!new java.io.File(d3, ".compact-flat").exists())
    assert(!new java.io.File(new java.io.File(d3).getParentFile,
      ".delete-compact-tbl").exists(), "staged duplicate cleared too")

    // the migration's own re-entry point: a crash AFTER it dropped the
    // husk dir but BEFORE renaming the staged tmp in (live dir absent,
    // sibling tmp holds the only copy) must restore on the next sweep —
    // the whole-dir-rename protocol's only intermediate state
    val d5 = Files.createTempDirectory("graft-legacy5").toString + "/tbl"
    (300L until 330L).toDF("v").coalesce(1).write.parquet(d5)
    val want5 = rows(d5)
    val parent5 = new java.io.File(d5).getParentFile
    assert(new java.io.File(d5)
      .renameTo(new java.io.File(parent5, ".delete-compact-tbl")))
    Compaction.migrateLegacyResidue(spark, d5)
    assert(rows(d5) == want5, "mid-migration crash state must restore")
    assert(!new java.io.File(parent5, ".delete-compact-tbl").exists())

    // old protocol crash MID-MOVE (round-14 review): the per-file move
    // loop emptied the live dir and moved SOME tmp files in before
    // dying — live is non-empty but the tmp holds the ONLY copies of
    // the remaining rows. A listing-only rule would read live as
    // authoritative and delete the tmp (silent row loss); the
    // content-reconciling migration must detect the disjoint row sets
    // and finish the move instead
    val d6 = Files.createTempDirectory("graft-legacy6").toString + "/tbl"
    (400L until 440L).toDF("v").repartition(4).write.parquet(d6)
    val want6 = rows(d6)
    val parent6 = new java.io.File(d6).getParentFile
    val tmp6 = new java.io.File(parent6, ".delete-compact-tbl")
    assert(new java.io.File(d6).renameTo(tmp6))
    new java.io.File(d6).mkdirs()
    // move ONE data file back in — the old loop's partial progress
    val moved = tmp6.listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).head
    assert(moved.renameTo(new java.io.File(d6, moved.getName)))
    Compaction.migrateLegacyResidue(spark, d6)
    assert(rows(d6) == want6,
      "mid-move crash must finish the move, not delete the only copies")
    assert(!tmp6.exists())

    // crash-before-delete with both dirs populated (tmp = complete
    // rewrite duplicate): the content compare must still drop the tmp
    val d7 = Files.createTempDirectory("graft-legacy7").toString + "/tbl"
    (500L until 520L).toDF("v").repartition(3).write.parquet(d7)
    val want7 = rows(d7)
    val parent7 = new java.io.File(d7).getParentFile
    spark.read.parquet(d7).coalesce(1).write
      .parquet(new java.io.File(parent7, ".delete-compact-tbl")
        .getAbsolutePath)
    Compaction.migrateLegacyResidue(spark, d7)
    assert(rows(d7) == want7, "complete-rewrite duplicate tmp must drop")
    assert(!new java.io.File(parent7, ".delete-compact-tbl").exists())
  }

  test("incremental over a pre-span-stage warehouse bootstraps the span tables first") {
    // MIGRATION path: a warehouse built before the span-trim stage
    // existed has no span tables and its packing tables were packed
    // over the UNtrimmed curated corpus. runIncremental must bootstrap
    // (build span tables from the existing curated corpus, repack over
    // the trimmed corpus) and then catch up — ending identical to a
    // full rebuild over the union, never an AnalysisException.
    val snapDir = Files.createTempDirectory("graft-cur-m-snap").toString
    val unionDir = Files.createTempDirectory("graft-cur-m-union").toString
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    docs0.write.parquet(s"$snapDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, snapDir)
    val fresh = "the quick brown fox jumps over the lazy dog while " +
      "seventeen violet umbrellas drift quietly past the harbor wall"
    val maxId = docs0.agg(max($"doc_id")).as[Long].head()
    val newRows = Seq(
      (maxId + 1, fresh, "fr", "src2"),
      (maxId + 2, fresh + " and then some", "fr", "src5"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    docs0.unionByName(newRows).write.parquet(s"$unionDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, unionDir)

    val wh = Files.createTempDirectory("graft-cur-m-wh").toString
    val pipe = new CurationPipeline(spark, wh)
    pipe.run(snapDir)
    // devolve the warehouse to the pre-span vintage: drop the three
    // span tables and overwrite both packing tables with legacy packs
    // over the UNtrimmed curated corpus
    val fs = new org.apache.hadoop.fs.Path(wh)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (t <- Seq("span_trimmed_corpus", "curation_span_grams",
        "curation_span_bloom"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$wh/$t"), true)
    for (t <- Seq("curated_packing", "train_split_packing"))
      graft.models.CurationModels.packSequencesFrom(
        graft.catalog.Tables.documents(spark, s"$wh/curated_corpus"))
        .write.mode("overwrite").partitionBy("lang", "shard")
        .parquet(s"$wh/$t")

    val rInc = pipe.runIncremental(unionDir)
    val whFull = Files.createTempDirectory("graft-cur-m-full").toString
    val rFull = new CurationPipeline(spark, whFull).run(unionDir)
    assert(rInc == rFull)
    for (t <- Seq("curation_funnel", "curated_corpus/documents.parquet",
        "span_trimmed_corpus/documents.parquet", "curation_span_grams",
        "curated_packing", "train_split_packing",
        "segment_stats", "curation_segments"))
      assert(tableRows(s"$wh/$t") == tableRows(s"$whFull/$t"), t)
    def bloomMd5(dir: String, table: String): String = spark.read
      .parquet(s"$dir/$table")
      .select(md5($"bloom")).as[String].head()
    assert(bloomMd5(wh, "curation_span_bloom")
      == bloomMd5(whFull, "curation_span_bloom"))
  }

  test("an interrupted bloom swap recovers before the next incremental (stale sidecar)") {
    graft.functions.GraftFunctions.register(spark)
    val snapDir = Files.createTempDirectory("graft-cur-r-snap").toString
    val unionDir = Files.createTempDirectory("graft-cur-r-union").toString
    val docs0 = spark.read.parquet(s"$sfDir/documents.parquet")
    docs0.write.parquet(s"$snapDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, snapDir)
    // the appended doc copies doc 3 verbatim: every segment is
    // historically known, so a CORRECT sidecar must flag each one
    // maybe-known and the keeper join must drop them all
    val dupOfOld = docs0.filter($"doc_id" === 3)
      .select($"text").head().getString(0)
    val maxId = docs0.agg(max($"doc_id")).as[Long].head()
    val newRows = Seq((maxId + 1, dupOfOld, "fr", "src1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    docs0.unionByName(newRows).write.parquet(s"$unionDir/documents.parquet")
    TestFixtures.embeddingsFor(spark, unionDir)

    val wh = Files.createTempDirectory("graft-cur-r-wh").toString
    val pipe = new CurationPipeline(spark, wh)
    pipe.run(snapDir)
    // simulate the crash: a bogus-content sidecar (STALE — it holds
    // none of the real keeper hashes, so unguarded probes would read
    // every known segment as definitely-new) plus the leftover .tmp
    // marker from the interrupted two-step swap
    Seq("bogus").toDF("x")
      .agg(org.apache.spark.sql.functions.expr("bloom_agg(x)").as("bloom"))
      .write.mode("overwrite").parquet(s"$wh/curation_segment_bloom")
    Seq("marker").toDF("x")
      .write.parquet(s"$wh/curation_segment_bloom.tmp")
    // same crash simulated for the span-gram sidecar: a stale filter
    // would read every known window gram as definitely-new and the
    // duplicate doc's spans would wrongly survive the trim
    Seq("bogus").toDF("x")
      .agg(org.apache.spark.sql.functions.expr("bloom_agg(x)").as("bloom"))
      .write.mode("overwrite").parquet(s"$wh/curation_span_bloom")
    Seq("marker").toDF("x")
      .write.parquet(s"$wh/curation_span_bloom.tmp")

    val rInc = pipe.runIncremental(unionDir)
    // recovery must have rebuilt the sidecar from curation_segments
    // BEFORE verdicting: the duplicate doc retains zero tokens and
    // adds no keepers — identical to a clean full run over the union
    val whFull = Files.createTempDirectory("graft-cur-r-full").toString
    val rFull = new CurationPipeline(spark, whFull).run(unionDir)
    assert(rInc == rFull)
    def rows(p: String): Seq[String] = {
      val df = spark.read.parquet(p)
      df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
        .collect().map(_.mkString("|")).sorted.toSeq
    }
    for (t <- Seq("segment_stats", "curation_segments",
        "span_trimmed_corpus/documents.parquet", "curation_span_grams"))
      assert(rows(s"$wh/$t") == rows(s"$whFull/$t"), t)
    // the markers are cleared and each sidecar matches a full rebuild's
    for (tmp <- Seq("curation_segment_bloom.tmp", "curation_span_bloom.tmp")) {
      val hadoopTmp = new org.apache.hadoop.fs.Path(s"$wh/$tmp")
      assert(!hadoopTmp.getFileSystem(
        spark.sparkContext.hadoopConfiguration).exists(hadoopTmp), tmp)
    }
    def bloomMd5(dir: String, table: String): String = spark.read
      .parquet(s"$dir/$table")
      .select(md5($"bloom")).as[String].head()
    for (t <- Seq("curation_segment_bloom", "curation_span_bloom"))
      assert(bloomMd5(wh, t) == bloomMd5(whFull, t), t)
  }
}
