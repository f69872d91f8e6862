package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.CurationPipeline

/** Document-family erasure (`CurationPipeline.deleteDocs`): delete +
  * incremental catch-up must equal a full rebuild over the corpus
  * WITHOUT the deleted docs, on EVERY curation table including both
  * bloom sidecars. The fixture is engineered to hit the hard cases:
  *
  *  - a deleted doc is the CANONICAL of an exact-dup group with a
  *    surviving member → the survivor re-verdicts (here: to `kept`)
  *    and enters the corpus, splits, trim, packing;
  *  - a deleted doc held the FIRST occurrence of a span gram another
  *    kept doc shares → the survivor's previously-trimmed text must be
  *    RESTORED (first-occurrence migration);
  *  - deleted docs held segment first-occurrence claims → keepers
  *    migrate and the survivor's segment stats change;
  *  - the deleted docs REMAIN in the corpus dir (upstream lag) — the
  *    tombstone log must exclude them from the repair and from the
  *    later incremental catch-up, and the watermark must stay monotone.
  *
  * All crafted ids sit above `SimilarityModels.AnnTrainCap`, so the
  * frozen IVF codebook (the snapshot reference the pipeline's
  * incremental contract already freezes) is identical on both sides.
  */
class CurationErasureSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // shared 14-token prefix of the span pair (> SpanL = 10)
  private val spanShared = (0 until 14).map(i => s"spansh$i").mkString(" ")
  private def uniq(tag: String, n: Int): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  private val dupText = uniq("erasdup", 24)
  // crafted docs: lang "de" (stratified sample keeps ALL non-en/zh
  // docs), source src5 (non-eval), unique token vocabularies (no eval
  // n-gram hits, no repetition flags)
  private val crafted = Seq(
    (500L, dupText, "de", "src5"),                               // canonical - DELETED
    (501L, dupText, "de", "src5"),                               // dup -> flips to kept
    (502L, s"$spanShared ${uniq("tailx", 8)}", "de", "src5"),    // span first - DELETED
    (503L, s"$spanShared ${uniq("taily", 8)}", "de", "src5"),    // span survivor
    (504L, uniq("erasplain", 22), "de", "src5"))                 // plain kept - DELETED
  private val delIds = Seq(500L, 502L, 504L)

  // embedding donor: a doc the plain funnel KEEPS — kept implies not
  // semantically contaminated, so copying its vector (cells and eval
  // refs are frozen) keeps every crafted doc's semantic verdict clean
  private lazy val donorId: Long =
    graft.models.CurationModels.curationFunnel(spark, sfDir)
      .filter($"verdict" === "kept")
      .agg(min($"doc_id")).as[Long].head()

  private def writeFixture(dir: String, ids: Seq[Long],
      extra: Seq[(Long, String, String, String)] = Seq.empty): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = (crafted ++ extra).filter(r => ids.contains(r._1))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    base.unionByName(rows)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val donor = emb.filter($"vec_id" === donorId)
      .select($"embedding", $"label").head()
    val craftedEmb = (crafted ++ extra).map(_._1).filter(ids.contains)
      .map(id => (id, donor.getSeq[Float](0), donor.getInt(1)))
      .toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label")
    emb.unionByName(craftedEmb)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  private def sortedRows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq.map(col)
    df.select(cols: _*).collect().map(_.toString).sorted.toSeq
  }

  private def assertTableEqual(whA: String, whB: String, table: String)
      : Unit = {
    val a = sortedRows(spark.read.parquet(s"$whA/$table"))
    val b = sortedRows(spark.read.parquet(s"$whB/$table"))
    assert(a == b, s"$table diverges after erasure: " +
      s"only-A=${(a.toSet -- b.toSet).take(2)}, " +
      s"only-B=${(b.toSet -- a.toSet).take(2)}")
  }

  private val allTables = Seq(
    "curation_funnel", "curation_groups",
    "curated_corpus/documents.parquet", "curation_splits",
    "span_trimmed_corpus/documents.parquet", "curation_span_grams",
    "curated_packing", "train_split_packing",
    "segment_stats", "curation_segments")

  private def assertBloomEqual(whA: String, whB: String, table: String)
      : Unit = {
    val a = spark.read.parquet(s"$whA/$table")
      .head().getAs[Array[Byte]]("bloom")
    val b = spark.read.parquet(s"$whB/$table")
      .head().getAs[Array[Byte]]("bloom")
    assert(java.util.Arrays.equals(a, b), s"$table sidecar diverges")
  }

  test("delete + catch-up == full rebuild minus the docs, every table + both sidecars") {
    val fixAll = Files.createTempDirectory("graft-eras-all").toString
    val fixMinus = Files.createTempDirectory("graft-eras-min").toString
    val craftedIds = crafted.map(_._1)
    writeFixture(fixAll, craftedIds)
    writeFixture(fixMinus, craftedIds.filterNot(delIds.contains))

    val whA = Files.createTempDirectory("graft-eras-whA").toString
    val whB = Files.createTempDirectory("graft-eras-whB").toString
    val pipeA = new CurationPipeline(spark, whA)
    val pipeB = new CurationPipeline(spark, whB)
    pipeA.run(fixAll)

    // fixture preconditions: the crafted cases are actually live
    val funnelPre = spark.read.parquet(s"$whA/curation_funnel")
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(funnelPre(500L) == "kept" && funnelPre(501L) == "duplicate",
      s"dup pair must be (kept, duplicate): ${funnelPre.filter(_._1 >= 500)}")
    assert(funnelPre(502L) == "kept" && funnelPre(503L) == "kept" &&
      funnelPre(504L) == "kept")
    val trimmedPre = spark.read
      .parquet(s"$whA/span_trimmed_corpus/documents.parquet")
      .filter($"doc_id" === 503L).select($"text").as[String].head()
    assert(!trimmedPre.contains("spansh0"),
      s"503's shared span must be trimmed pre-delete, got: $trimmedPre")

    // unknown ids are rejected from the log (watermark protection) —
    // and the rejection is VISIBLE in the report (round-13 review:
    // silently-lossy deletes are operationally blind)
    val unknownRep = pipeA.deleteDocs(fixAll, Seq(999999L).toDF("doc_id"))
    assert(!new java.io.File(s"$whA/curation_tombstones").exists() ||
      spark.read.parquet(s"$whA/curation_tombstones").count() == 0)
    assert(unknownRep.requestedDeletes == 1L &&
      unknownRep.validatedDeletes == 0L &&
      unknownRep.droppedUnknownDeletes == 1L,
      s"the all-unknown batch must surface its drop count: $unknownRep")

    // eval-sourced ids are refused loudly
    val evalId = funnelPre.collectFirst {
      case (id, v) if v == "eval" => id }.get
    intercept[IllegalArgumentException] {
      pipeA.deleteDocs(fixAll, Seq(evalId).toDF("doc_id"))
    }

    // materialize an epoch BEFORE the erasure: shard rows carry the
    // document payload, so the files must be regenerated by the delete
    // (erased text surviving in a shard file is the compliance leak)
    pipeA.writeEpochShards(0L, shards = 4L)
    // shards carry only TRAIN-labeled docs (the c12 restriction), and
    // the split is a content-hash coin — probe whichever deleted kept
    // docs actually landed in train
    val delTrain = spark.read.parquet(s"$whA/curation_splits")
      .filter($"split" === "train" && $"doc_id".isin(delIds: _*))
      .select($"doc_id").as[Long].collect().toSeq
    assert(delTrain.nonEmpty,
      "fixture: at least one deleted kept doc must be train-labeled")
    assert(spark.read.parquet(s"$whA/epoch_shards/epoch=0")
      .filter($"doc_id".isin(delTrain: _*)).count() > 0,
      "fixture: a to-be-erased doc must ride the epoch shards")
    // a second epoch at WIDE geometry: with 16 shards and a handful of
    // changed docs, some shards provably contain none of them — the
    // scoped purge must leave those FILES untouched (round-13 "next"
    // #1's byte-identity criterion)
    pipeA.writeEpochShards(1L, shards = 16L)
    def shardFiles(epoch: Long): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(new java.io.File(s"$whA/epoch_shards/epoch=$epoch"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
        .toMap
    }
    def shardRows(epoch: Long): Map[Long, Seq[String]] =
      spark.read.parquet(s"$whA/epoch_shards/epoch=$epoch")
        .select($"shard".cast("long"), $"shard_pos", $"doc_id", $"text")
        .collect().map(r => (r.getLong(0), r.toString))
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val e1FilesPre = shardFiles(1L)
    val e1RowsPre = shardRows(1L)
    // an ORPHAN epoch dir — shard files written, manifest write never
    // landed (the interrupted-writer crash state): unpublished payload
    // the purge must delete outright (round-13 review, medium)
    pipeA.writeEpochShards(2L, shards = 2L)
    val (mPath, mFs) = {
      val p = new org.apache.hadoop.fs.Path(
        s"$whA/epoch_shard_manifest/epoch=2")
      (p, p.getFileSystem(spark.sparkContext.hadoopConfiguration))
    }
    assert(mFs.delete(mPath, true))

    // THE ERASURE (docs still present in fixAll - upstream lag)
    val delRep = pipeA.deleteDocs(fixAll, delIds.toDF("doc_id"))
    assert(delRep.requestedDeletes == 3L && delRep.validatedDeletes == 3L
      && delRep.droppedUnknownDeletes == 0L,
      s"a fully-known batch reports zero drops: $delRep")
    pipeB.run(fixMinus)

    // the orphan epoch (payload with no manifest row) is gone outright
    assert(!new java.io.File(s"$whA/epoch_shards/epoch=2").exists(),
      "unpublished epoch dirs must purge — their shard files carry " +
        "payload the manifest doesn't know about")

    // scoped purge, epoch 1 @ 16 shards: rows equal a fresh emit over
    // the minus corpus, AND every shard whose row content is unchanged
    // kept its exact file (same path, length, mtime — never rewritten)
    val e1RowsPost = shardRows(1L)
    pipeB.writeEpochShards(1L, shards = 16L)
    val e1RowsWant = spark.read.parquet(s"$whB/epoch_shards/epoch=1")
      .select($"shard".cast("long"), $"shard_pos", $"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.toString))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(e1RowsPost == e1RowsWant,
      "scoped rewrite must land exactly the fresh-emit content")
    val untouchedShards = e1RowsPre.keySet
      .filter(s => e1RowsPost.get(s) == e1RowsPre.get(s))
    assert(untouchedShards.nonEmpty,
      "fixture: 16-shard geometry must leave some shards untouched")
    val e1FilesPost = shardFiles(1L)
    untouchedShards.foreach { s =>
      val pre = e1FilesPre.filter(_._1.contains(s"shard=$s/"))
      val post = e1FilesPost.filter(_._1.contains(s"shard=$s/"))
      assert(pre == post && pre.nonEmpty,
        s"untouched shard $s files must keep their bytes: $pre vs $post")
    }
    assert(untouchedShards != e1RowsPre.keySet,
      "fixture: the erasure must actually touch some shard")

    // the epoch regenerated at its recorded geometry, erased text gone,
    // and the shard content equals a fresh emit over the minus corpus
    val shardsA = spark.read.parquet(s"$whA/epoch_shards/epoch=0")
      .select($"shard".cast("long"), $"shard_pos", $"doc_id", $"text")
    assert(shardsA.filter($"text".contains("erasplain0") ||
      $"doc_id".isin(delIds: _*)).count() == 0,
      "erased docs must purge from the materialized epoch shards")
    pipeB.writeEpochShards(0L, shards = 4L)
    val shardsB = spark.read.parquet(s"$whB/epoch_shards/epoch=0")
      .select($"shard".cast("long"), $"shard_pos", $"doc_id", $"text")
    assert(sortedRows(shardsA.toDF("shard", "shard_pos", "doc_id", "text"))
      == sortedRows(shardsB.toDF("shard", "shard_pos", "doc_id", "text")),
      "regenerated shards must equal a fresh emit over the minus corpus")

    val funnelPost = spark.read.parquet(s"$whA/curation_funnel")
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(!funnelPost.contains(500L) && !funnelPost.contains(502L) &&
      !funnelPost.contains(504L), "deleted rows must leave the funnel")
    assert(funnelPost(501L) == "kept",
      s"the surviving duplicate must re-verdict to kept: ${funnelPost(501L)}")
    val trimmedPost = spark.read
      .parquet(s"$whA/span_trimmed_corpus/documents.parquet")
      .filter($"doc_id" === 503L).select($"text").as[String].head()
    assert(trimmedPost.contains("spansh0"),
      "503's span must be RESTORED once its first holder is erased")

    allTables.foreach(t => assertTableEqual(whA, whB, t))
    assertBloomEqual(whA, whB, "curation_segment_bloom")
    assertBloomEqual(whA, whB, "curation_span_bloom")

    // --- incremental catch-up after the erasure: append the same new
    // docs to BOTH corpora (fixAll still carries the deleted docs)
    val newDocs = Seq(
      (505L, uniq("newdoc505x", 21), "fr", "src3"),
      (506L, uniq("newdoc506x", 23), "fr", "src3"))
    writeFixture(fixAll, craftedIds ++ Seq(505L, 506L), newDocs)
    writeFixture(fixMinus,
      craftedIds.filterNot(delIds.contains) ++ Seq(505L, 506L), newDocs)
    pipeA.runIncremental(fixAll)
    pipeB.runIncremental(fixMinus)
    allTables.foreach(t => assertTableEqual(whA, whB, t))
    assertBloomEqual(whA, whB, "curation_segment_bloom")
    assertBloomEqual(whA, whB, "curation_span_bloom")

    // --- idempotency: re-issuing the same erasure changes nothing
    // (also the crash-recovery path: re-run with the same ids)
    pipeA.deleteDocs(fixAll, delIds.toDF("doc_id"))
    allTables.foreach(t => assertTableEqual(whA, whB, t))
    assertBloomEqual(whA, whB, "curation_segment_bloom")
    assertBloomEqual(whA, whB, "curation_span_bloom")

    // the re-issued erasure diffs each epoch against its OWN files, so
    // docs appended by the interleaved catch-up above fold in too —
    // the epoch equals one fresh writer emission over the CURRENT
    // corpus, never a mix of corpus versions (round-14 review finding)
    pipeB.writeEpochShards(0L, shards = 4L)
    def epochRows(wh: String): Seq[String] =
      sortedRows(spark.read.parquet(s"$wh/epoch_shards/epoch=0")
        .select($"shard".cast("long").as("shard"), $"shard_pos",
          $"doc_id", $"text"))
    assert(epochRows(whA) == epochRows(whB),
      "post-catch-up erasure must leave the epoch ≡ a fresh emit " +
        "over the current corpus")

    // --- mid-swap crash on the tombstone LOG (round-13 high finding):
    // compact() folds the log via SwapWrite; between its two renames
    // the dir is ABSENT with the only copy in the .swap- sibling. The
    // missing→empty bootstrap fallback must NOT win over recovery —
    // with an empty log these already-tombstoned ids would read as
    // unknown (validated=0) and history would silently reopen
    assert(new java.io.File(s"$whA/curation_tombstones")
      .renameTo(new java.io.File(s"$whA/.swap-curation_tombstones")))
    val recRep = pipeA.deleteDocs(fixAll, delIds.toDF("doc_id"))
    assert(recRep.validatedDeletes == 3L,
      s"tombstone accessor must recover the mid-swap log: $recRep")
    assert(new java.io.File(s"$whA/curation_tombstones").exists())
    allTables.foreach(t => assertTableEqual(whA, whB, t))
  }
}
