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
}
