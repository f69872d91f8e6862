package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{CurationModels, DedupModels, SimilarityModels}

/** Semantics of the round-12 training-stream operators the DuckDB
  * oracle proves cross-engine but can't prove MEAN the right thing:
  *
  *  - c14 domain mixture: T=2 flattening over DISCOVERED (IVF-cell)
  *    domains — dominant cells downsample, rare cells upsample, and
  *    every vector carries a deterministic replication index;
  *  - c15 epoch shuffle: a deterministic permutation into balanced
  *    shards with dense within-shard positions;
  *  - d12 canonical representative: the near-dup cluster keeps its
  *    BEST-quality doc, not its min id.
  */
class MixShuffleRepSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  val sfDir = "/root/testdata/sf0.001"

  test("c14: every vector weighted once; rarer cells repeat harder") {
    val out = SimilarityModels.domainMixture(spark, sfDir)
      .select($"vec_id", $"cell", $"share_micros", $"mix_weight",
        $"repeat_factor", $"n_copies")
      .as[(Long, Long, Long, Double, Double, Long)].collect()
    val nVecs = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    assert(out.length == nVecs, "one mixture row per vector")
    assert(out.map(_._1).distinct.length == out.length)

    val cells = out.map(r => (r._2, r._3, r._5)).distinct
    assert(cells.length > 1, "fixture must discover multiple domains")
    // T=2 flattening is monotone: higher share => lower repeat factor
    for (Seq(a, b) <- cells.sortBy(_._2).toSeq.combinations(2)) {
      if (a._2 > b._2)
        assert(a._3 <= b._3,
          s"dominant cell ${a._1} must not out-repeat rare cell ${b._1}")
    }
    // shares partition the corpus (floor division loses < 1 micro/cell)
    val shareSum = cells.map(_._2).sum
    assert(shareSum > 1000000L - cells.length && shareSum <= 1000000L)
    // replication index brackets its repeat factor
    assert(out.forall(r => r._6 == math.floor(r._5).toLong ||
      r._6 == math.floor(r._5).toLong + 1))
  }

  test("c15: deterministic permutation, dense positions, balanced shards") {
    val out = CurationModels.epochShuffle(spark, sfDir)
      .select($"doc_id", $"shard", $"shard_pos", $"perm")
      .as[(Long, Long, Long, String)].collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs, "every doc shuffled exactly once")
    assert(out.forall(r => r._2 >= 0 && r._2 < CurationModels.EpochShards))
    // within a shard: positions are dense 1..n and follow perm order
    out.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions must be dense")
      val perms = sorted.map(r => (r._4, r._1)).toSeq
      assert(perms == perms.sorted,
        s"shard $shard order must follow the permutation key")
    }
    // md5 keys are uniform: no shard may be empty or grossly oversized
    val sizes = out.groupBy(_._2).map(_._2.length)
    assert(sizes.size == CurationModels.EpochShards)
    assert(sizes.max < 3 * sizes.min,
      s"shards must be balanced, got $sizes")
    // the shuffle decorrelates from doc_id order: some shard must hold
    // docs that are far apart in id space
    assert(out.groupBy(_._2).exists { case (_, rows) =>
      val ids = rows.map(_._1); ids.max - ids.min > nDocs / 2 })
  }

  test("c15: epochs reshuffle; any single epoch replays bit-identically") {
    def orderOf(epoch: Long): Seq[Long] =
      CurationModels.epochShuffleAt(spark, sfDir, epoch)
        .select($"shard", $"shard_pos", $"doc_id")
        .as[(Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._2)).map(_._3).toSeq
    val e0 = orderOf(0L)
    val e1 = orderOf(1L)
    assert(e0.sorted == e1.sorted, "every epoch covers the same corpus")
    assert(e0 != e1, "different epochs must read in different orders")
    assert(orderOf(1L) == e1, "a given epoch replays identically")
  }

  test("c15: production shard geometry is a parameter, not a recompile") {
    val out = CurationModels.epochShuffleAt(spark, sfDir, 0L, shards = 3L)
      .select($"doc_id", $"shard", $"shard_pos")
      .as[(Long, Long, Long)].collect()
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(out.length == nDocs)
    assert(out.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L))
    out.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions must stay dense at non-default geometry")
    }
    // same epoch, different geometry: the PERMUTATION is unchanged
    // (shard+pos is just a bucketing of the same md5 order)
    val flat8 = CurationModels.epochShuffleAt(spark, sfDir, 0L)
      .select($"doc_id", $"perm").as[(Long, String)].collect().toMap
    val flat3 = CurationModels.epochShuffleAt(spark, sfDir, 0L, shards = 3L)
      .select($"doc_id", $"perm").as[(Long, String)].collect().toMap
    assert(flat8 == flat3, "the permutation key is geometry-independent")
  }

  test("d12: the cluster representative is the best-quality doc, not min id") {
    // doc 0 and doc 3 share their first 18 tokens (near-dup pair);
    // doc 3's two edited tokens are stopwords, lifting its t03
    // stop-ratio point => doc 3 outscores doc 0 and must be canonical
    // despite the larger id
    val base = (0 until 18).map(i => s"filler$i").mkString(" ")
    val rows = Seq(
      (0L, s"$base xx yy", "en", "s"),
      (3L, s"$base the of", "en", "s"),
      (10L, "beta0 beta1 beta2 beta3", "de", "s"),
      (11L, "gamma0 gamma1 gamma2 gamma3", "de", "s"))
    val dir = Files.createTempDirectory("graft-d12").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // precondition: the pair is one d07 component
    val comp = DedupModels.nearDupClusters(spark, dir)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(comp.map(_._1).toSeq == Seq(0L, 3L) && comp.forall(_._2 == 0L),
      s"docs 0 and 3 must form one near-dup component: ${comp.toSeq}")
    val out = DedupModels.canonicalRepresentative(spark, dir)
      .select($"doc_id", $"component_id", $"quality_score", $"is_canonical")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 3L))
    val byDoc = out.map(r => r._1 -> r).toMap
    assert(byDoc(3L)._3 > byDoc(0L)._3,
      s"fixture must give doc 3 the higher quality: ${out.toSeq}")
    assert(byDoc(3L)._4 && !byDoc(0L)._4,
      s"doc 3 must be canonical: ${out.toSeq}")
  }

  test("d12: quality ties fall back to min doc_id") {
    // byte-identical texts => equal quality; min id wins
    val text = (0 until 20).map(i => s"same$i").mkString(" ")
    val dir = Files.createTempDirectory("graft-d12tie").toString
    Seq((7L, text, "en", "s"), (2L, text, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupModels.canonicalRepresentative(spark, dir)
      .select($"doc_id", $"is_canonical").as[(Long, Boolean)]
      .collect().toMap
    assert(out == Map(2L -> true, 7L -> false), out.toString)
  }
}
