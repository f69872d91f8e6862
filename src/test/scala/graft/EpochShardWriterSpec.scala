package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.CurationModels
import graft.runner.CurationPipeline

/** The epoch shard-file writer: per-shard parquet files whose STORED
  * row order is the c15 permutation, offsets packed over the epoch
  * stream, one file per shard, a manifest row per shard, idempotent
  * re-runs, and distinct epochs living side by side.
  */
class EpochShardWriterSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** A minimal warehouse holding just the two tables the writer reads:
    * the trimmed corpus (any documents-schema table works) and the
    * split labels over it. */
  private def makeWarehouse(): String = {
    val wh = Files.createTempDirectory("graft-esw").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.write.parquet(s"$wh/span_trimmed_corpus/documents.parquet")
    CurationModels.splitLabelsFrom(docs)
      .write.parquet(s"$wh/curation_splits")
    wh
  }

  test("shard files hold the c15 permutation in stored order with packed offsets") {
    val wh = makeWarehouse()
    val pipe = new CurationPipeline(spark, wh)
    val shards = 4L
    val manifest = pipe.writeEpochShards(epoch = 0L, shards = shards)
      .select($"epoch", $"shard", $"n_docs", $"n_tokens", $"n_seqs",
        $"boundary_splits")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(_._2)

    // the expected permutation over the TRAIN slice
    val trainIds = spark.read.parquet(s"$wh/curation_splits")
      .filter($"split" === "train").select($"doc_id")
    val trainDocs = spark.read
      .parquet(s"$wh/span_trimmed_corpus/documents.parquet")
      .join(trainIds, Seq("doc_id"), "left_semi")
    val expected = CurationModels.epochShuffleFrom(trainDocs, 0L, shards)
      .select($"shard", $"shard_pos", $"doc_id", $"n_tokens")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    assert(manifest.map(_._2).toSeq == (0L until shards).toSeq,
      "one manifest row per shard")
    assert(manifest.map(_._3).sum == trainDocs.count(),
      "every train doc lands in exactly one shard")

    (0L until shards).foreach { s =>
      val dir = new java.io.File(s"$wh/epoch_shards/epoch=0/shard=$s")
      val dataFiles = dir.listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(dataFiles.length == 1,
        s"shard $s must be ONE ordered file, got ${dataFiles.length}")
      // stored order: single small file => single split => collect()
      // returns file order
      val rows = spark.read.parquet(dataFiles.head.getAbsolutePath)
        .select($"shard_pos", $"doc_id", $"n_tokens", $"start_offset",
          $"first_seq", $"last_seq", $"boundary_split")
        .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq,
        s"shard $s rows must be STORED in shard_pos order")
      assert(rows.map(r => (r._2, r._1)).toSeq ==
        expected(s).map(r => (r._3, r._2)).toSeq,
        s"shard $s doc order must equal the c15 permutation")
      // offsets are the running token sum over the epoch stream
      var off = 0L
      rows.foreach { r =>
        assert(r._4 == off, s"shard $s offsets must be contiguous")
        assert(r._5 == off / CurationModels.PackBudget)
        assert(r._6 == (off + r._3 - 1) / CurationModels.PackBudget)
        assert(r._7 == (r._6 > r._5))
        off += r._3
      }
      val m = manifest.find(_._2 == s).get
      assert(m._3 == rows.length && m._4 == off,
        s"manifest docs/tokens must match shard $s content")
      assert(m._5 == (off - 1) / CurationModels.PackBudget + 1,
        s"manifest n_seqs must be the packed window count")
      // the payload rides the row: every shard row's text equals the
      // trimmed corpus text for its doc (no dataloader-side join)
      val texts = spark.read.parquet(dataFiles.head.getAbsolutePath)
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      val want = trainDocs.filter($"doc_id".isin(texts.keys.toSeq: _*))
        .select($"doc_id", $"text").as[(Long, String)].collect().toMap
      assert(texts == want, s"shard $s payload must be the trimmed text")
    }
  }

  test("re-runs are idempotent; epochs coexist and differ; geometry is parameterized") {
    val wh = makeWarehouse()
    val pipe = new CurationPipeline(spark, wh)
    val m0a = pipe.writeEpochShards(0L, shards = 3L)
      .collect().map(_.toString).sorted.toSeq
    def shardOrder(epoch: Long): Seq[Long] = {
      spark.read.parquet(s"$wh/epoch_shards/epoch=$epoch")
        .select($"shard".cast("long"), $"shard_pos", $"doc_id")
        .as[(Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).map(_._3).toSeq
    }
    val order0 = shardOrder(0L)
    val m1 = pipe.writeEpochShards(1L, shards = 3L)
    assert(m1.count() == 3L)
    val order1 = shardOrder(1L)
    assert(order0.sorted == order1.sorted, "same docs every epoch")
    assert(order0 != order1, "epochs must read in different orders")
    assert(shardOrder(0L) == order0,
      "writing epoch 1 must not disturb epoch 0's files")
    // re-run epoch 0: same files, same manifest rows; epoch 1's
    // manifest rows survive the dynamic overwrite
    val m0b = pipe.writeEpochShards(0L, shards = 3L)
      .collect().map(_.toString).sorted.toSeq
    assert(m0b == m0a, "epoch re-run must be idempotent")
    assert(shardOrder(0L) == order0)
    assert(spark.read.parquet(s"$wh/epoch_shard_manifest")
      .select($"epoch").distinct().count() == 2L,
      "both epochs' manifest rows must coexist")
  }

  test("resume cursors: seeking to a cursor reads exactly the suffix a full read delivers") {
    val wh = makeWarehouse()
    val pipe = new CurationPipeline(spark, wh)
    pipe.writeEpochShards(0L, shards = 2L)
    val manifest: Map[Long, Seq[(Long, Long, Long)]] =
      spark.read.parquet(s"$wh/epoch_shard_manifest")
        .filter($"epoch" === 0)
        .select($"shard", $"cursors")
        .collect().map { r =>
          r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1)
            .map(c => (c.getLong(0), c.getLong(1), c.getLong(2))).toSeq
        }.toMap
    assert(manifest.values.exists(_.nonEmpty),
      "fixture must produce at least one checkpoint (shards carry " +
        "more than EpochCursorSeqs sequences at 2-shard geometry)")
    manifest.foreach { case (s, cursors) =>
      // the shard's rows in stored (shard_pos) order; the symbolic
      // token stream (doc_id, k) for k < n_tokens is equality-exact
      // without re-tokenizing the payload
      val rows = spark.read.parquet(s"$wh/epoch_shards/epoch=0")
        .filter($"shard" === s)
        .select($"shard_pos", $"doc_id", $"n_tokens")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      def stream(from: Seq[(Long, Long, Long)]): Seq[(Long, Long)] =
        from.flatMap(r => (0L until r._3).map(k => (r._2, k)))
      val full = stream(rows.toIndexedSeq)
      // cursors are sorted, unique per sequence, and aligned to the
      // checkpoint interval
      assert(cursors.map(_._1) == cursors.map(_._1).sorted)
      assert(cursors.map(_._1).distinct.size == cursors.size)
      cursors.foreach { case (seq, row, skip) =>
        assert(seq % CurationModels.EpochCursorSeqs == 0,
          s"checkpoints sit on the cursor interval, got seq=$seq")
        val seekPos = seq * CurationModels.PackBudget
        // full read from the sequence boundary...
        val wantSuffix = full.drop(seekPos.toInt)
        // ...must equal: open the file at row index `row`, discard
        // `skip` tokens, stream on
        val viaCursor = stream(rows.filter(_._1 >= row).toIndexedSeq)
          .drop(skip.toInt)
        assert(viaCursor == wantSuffix,
          s"shard $s cursor (seq=$seq,row=$row,skip=$skip) must " +
            "deliver the exact suffix")
        // the cursor lands INSIDE its row (no dead rows to skip over)
        val owner = rows.find(_._1 == row).get
        assert(skip >= 0 && skip < owner._3,
          s"skip=$skip must fall within the owning doc (${owner._3})")
      }
    }
  }

  test("an epoch over an empty train split publishes nothing and throws nothing") {
    // the erasure purge's full-regeneration fallback can hit an epoch
    // whose train corpus has emptied — the writer must drop the epoch
    // (dir + manifest partition) instead of reading an empty
    // partitioned dir (round-14 review finding)
    val wh = Files.createTempDirectory("graft-esw-empty").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.filter($"doc_id" < 0) // empty, schema intact
      .write.parquet(s"$wh/span_trimmed_corpus/documents.parquet")
    CurationModels.splitLabelsFrom(docs.filter($"doc_id" < 0))
      .write.parquet(s"$wh/curation_splits")
    val pipe = new CurationPipeline(spark, wh)
    val manifest = pipe.writeEpochShards(0L, shards = 2L)
    assert(manifest.count() == 0, "empty epoch returns an empty manifest")
    assert(!new java.io.File(s"$wh/epoch_shards/epoch=0").exists(),
      "no payload dir may remain")
    assert(!new java.io.File(s"$wh/epoch_shard_manifest/epoch=0").exists(),
      "no manifest partition may remain")
  }

  test("vacuumEpochs drops exactly the unkept epochs from files and manifest, idempotently") {
    val wh = makeWarehouse()
    val pipe = new CurationPipeline(spark, wh)
    pipe.writeEpochShards(0L, shards = 2L)
    pipe.writeEpochShards(1L, shards = 3L)
    pipe.writeEpochShards(2L, shards = 2L)
    def fileStats(epoch: Long): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(new java.io.File(s"$wh/epoch_shards/epoch=$epoch"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
        .toMap
    }
    val keptStats = fileStats(1L)
    val dropped = pipe.vacuumEpochs(keep = Seq(1L))
    assert(dropped == Seq(0L, 2L), s"dropped=$dropped")
    assert(!new java.io.File(s"$wh/epoch_shards/epoch=0").exists())
    assert(!new java.io.File(s"$wh/epoch_shards/epoch=2").exists())
    assert(spark.read.parquet(s"$wh/epoch_shard_manifest")
      .select($"epoch".cast("long")).distinct().as[Long].collect().toSeq
      == Seq(1L), "manifest must only know the kept epoch")
    // the kept epoch's files never move: byte-identity by stat
    assert(fileStats(1L) == keptStats,
      "vacuum must not rewrite kept epochs")
    // idempotent
    assert(pipe.vacuumEpochs(keep = Seq(1L)).isEmpty)
    assert(fileStats(1L) == keptStats)
  }
}
