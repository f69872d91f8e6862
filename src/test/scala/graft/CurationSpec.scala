package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.CurationModels

/** Edge-case semantics for the curation tier (c03/c04/c05) on
  * handcrafted documents — the places the geometry is easy to get
  * wrong: chunk boundaries at exactly W and W+1 tokens, packing
  * boundary splits at exact budget multiples, repetition flags on
  * degenerate (all-same-token) docs. The sf0.01 oracle checks prove
  * engine-vs-DuckDB agreement; these prove the NUMBERS mean what the
  * scaladoc claims.
  */
class CurationSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  /** Write handcrafted docs as a documents.parquet fixture dir, plus
    * one-hot embeddings (distinct slots → cosine 0 → no accidental c11
    * flags; the sem-precedence test below plants a shared slot). */
  private def docsDir(rows: Seq[(Long, String, String, String)],
      slotOf: Long => Int = id => (id % 64).toInt): String = {
    val dir = Files.createTempDirectory("graft-curation").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TestFixtures.oneHotEmbeddingsFor(spark, dir, slotOf)
    dir
  }

  test("c03: degenerate all-same-token doc flags; fully distinct doc does not") {
    val dir = docsDir(Seq(
      (1L, "a a a a a a", "en", "s"), // 6 tokens, 1 distinct, run 6
      (2L, "a b c d e f", "en", "s"), // all distinct, runs of 1
      (3L, "a", "en", "s"))) // 1 token: excluded (no bigrams)
    val out = CurationModels.repetitionSignals(spark, dir)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == Set(1L, 2L))
    val r1 = out(1L)
    assert(r1.getAs[Long]("total_tokens") == 6)
    assert(r1.getAs[Long]("distinct_tokens") == 1)
    assert(r1.getAs[Long]("top_token_count") == 6)
    assert(r1.getAs[Long]("total_bigrams") == 5)
    assert(r1.getAs[Long]("distinct_bigrams") == 1) // "a a" ×5
    assert(r1.getAs[Long]("ttr_micros") == 166666) // floor(1e6/6)
    assert(r1.getAs[Long]("dup_bigram_micros") == 800000)
    assert(r1.getAs[Boolean]("flagged"))
    val r2 = out(2L)
    assert(r2.getAs[Long]("top_token_count") == 1)
    assert(r2.getAs[Long]("ttr_micros") == 1000000)
    assert(r2.getAs[Long]("dup_bigram_micros") == 0)
    assert(!r2.getAs[Boolean]("flagged"))
  }

  test("c03: top_token_count is the max frequency, not the max adjacent run") {
    // 'b' appears 3 times but never adjacently — sort_array makes the
    // fold count frequency, not surface runs
    val dir = docsDir(Seq((1L, "b x b y b z", "en", "s")))
    val r = CurationModels.repetitionSignals(spark, dir).head()
    assert(r.getAs[Long]("top_token_count") == 3)
  }

  test("c04: chunk geometry at n<W, n=W, n=W+1, and exact coverage") {
    val w = 32; val s = 24
    def doc(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, doc(5), "en", "s"), // n < W: one short chunk
      (2L, doc(w), "en", "s"), // n = W: exactly one full chunk
      (3L, doc(w + 1), "en", "s"), // n = W+1: second chunk carries tail
      (4L, doc(80), "en", "s"))) // chunks at 0,24,48 — 48+32=80 covers the doc
    val out = CurationModels.chunkWindows(spark, dir)
      .select($"doc_id", $"chunk_index", $"chunk_start", $"chunk_tokens")
      .as[(Long, Long, Long, Long)].collect().sorted
    assert(out.filter(_._1 == 1L).toSeq == Seq((1L, 0L, 0L, 5L)))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 0L, 32L)))
    assert(out.filter(_._1 == 3L).toSeq ==
      Seq((3L, 0L, 0L, 32L), (3L, 1L, 24L, 9L)))
    assert(out.filter(_._1 == 4L).toSeq == Seq((4L, 0L, 0L, 32L),
      (4L, 1L, 24L, 32L), (4L, 2L, 48L, 32L))) // no redundant tail chunk
    // coverage: consecutive chunks overlap by exactly W−S=8 tokens and
    // the last chunk reaches the document end
    val d4 = out.filter(_._1 == 4L)
    assert(d4.sliding(2).forall { case Array(a, b) =>
      b._3 == a._3 + s && a._3 + a._4 - b._3 == (w - s).min(b._4.toInt)
    })
    assert(d4.last._3 + d4.last._4 == 80)
  }

  test("c05: packing offsets are contiguous per stream; boundary splits exact") {
    // budget 256: doc sizes 200, 56, 100 → offsets [0,200) [200,256) [256,356)
    // doc 2 ends exactly at the budget boundary → NOT split;
    // doc 3 sits wholly in seq 1 → not split;
    // then 150 + 120: [356,506) spans seqs 1..1? 506/256 → first=1 last=1 no;
    // add 20-token doc at [506,526): first=1, last=2? 525 div 256 = 2 → split
    //
    // Geometry is pinned on packSequencesFrom — the RAW packer every
    // surface composes. (The published c05 query trims first, and a
    // fixture of identical repeated tokens is exactly what a span
    // trimmer eats; trim semantics have their own specs — d11 /
    // CurationPipelineSpec.)
    val sizes = Seq(200, 56, 100, 150, 20)
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, doc(n), "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val out = CurationModels.packSequencesFrom(docs)
      .orderBy($"doc_id")
      .select($"start_offset", $"n_tokens", $"first_seq", $"last_seq",
        $"boundary_split")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    // contiguity: each start = previous start + previous n
    assert(out.sliding(2).forall { case Seq(a, b) => b._1 == a._1 + a._2 })
    assert(out.map(_._1) == Seq(0L, 200L, 256L, 356L, 506L))
    // doc 0 crosses 0→200? no (200 < 256): not split
    assert(out(0) == ((0L, 200L, 0L, 0L, false)))
    // doc 1 [200,256): last token at offset 255 → still seq 0, not split
    assert(out(1) == ((200L, 56L, 0L, 0L, false)))
    // doc 2 [256,356): wholly seq 1
    assert(out(2) == ((256L, 100L, 1L, 1L, false)))
    // doc 3 [356,506): 505 div 256 = 1 → seq 1, not split
    assert(out(3) == ((356L, 150L, 1L, 1L, false)))
    // doc 4 [506,526): 506 div 256 = 1, 525 div 256 = 2 → SPLIT
    assert(out(4) == ((506L, 20L, 1L, 2L, true)))
  }

  test("c06: funnel verdicts follow pipeline precedence") {
    // docs 1/2 are identical AND repetitive; doc 3 is eval-source and
    // also a duplicate of them — precedence must be eval > duplicate >
    // repetitive (sampling never reached for any of these)
    val rep = "a a a a a a"
    val dir = docsDir(Seq(
      (1L, rep, "en", "s"),
      (2L, rep, "en", "s"),
      (3L, rep, "en", "src0"),
      (4L, "b c d e f g", "fr", "s"))) // clean: fr keeps all buckets
    val out = CurationModels.curationFunnel(spark, dir)
      .select($"doc_id", $"verdict").as[(Long, String)].collect().toMap
    assert(out(3L) == "eval") // eval wins even though it's a duplicate
    assert(out(1L) == "repetitive") // canonical, so dedup passes it
    assert(out(2L) == "duplicate") // duplicate wins over repetitive
    assert(out(4L) == "kept")
  }

  test("c06: a paraphrased eval twin is sem_contaminated (token overlap blind)") {
    // doc 2 shares NO tokens with the eval doc 1 (c01 passes it) but
    // its embedding is doc 1's exact one-hot (cosine 1 ≥ τ, same cell
    // by construction) — only the c11 leg can catch it. doc 3 is an
    // orthogonal control.
    val dir = docsDir(Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "src0"),
      (2L, "uno dos tres cuatro cinco seis", "en", "s"),
      (3L, "foo bar baz qux quux corge", "en", "s")),
      slotOf = id => if (id == 2L) 1 else (id % 64).toInt)
    val out = CurationModels.curationFunnel(spark, dir)
      .select($"doc_id", $"sem_contaminated", $"verdict")
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((false, "eval")))
    assert(out(2L)._1 && out(2L)._2 == "sem_contaminated",
      s"paraphrased twin must flag semantically: ${out(2L)}")
    assert(!out(3L)._1, "orthogonal doc must not flag")
  }

  test("c06→c05 composition: packing the kept set stays contiguous") {
    val dir = docsDir((1 to 20).map(i =>
      (i.toLong, (1 to 10).map(j => s"w$i$j").mkString(" "), "fr", "s")))
    val kept = CurationModels.curationFunnel(spark, dir)
      .filter($"verdict" === "kept").select($"doc_id")
    assert(kept.count() == 20) // fr, all distinct+clean: funnel keeps all
    val packed = CurationModels.packSequences(spark, dir)
      .join(kept, Seq("doc_id"))
      .orderBy($"doc_id")
      .select($"start_offset", $"n_tokens").as[(Long, Long)].collect()
    assert(packed.sliding(2).forall { case Array(a, b) => b._1 == a._1 + a._2 })
  }

  test("c07: temperature mixing flattens — dominant down, rare up") {
    // 90/10 split: share_en = .9, share_fr = .1. T=2 weights ∝ sqrt:
    // w_en ≈ .949, w_fr ≈ .316 → repeat_en ≈ .834 (downsample),
    // repeat_fr ≈ 2.5 (upsample)
    val dir = docsDir(
      (1 to 90).map(i => (i.toLong, s"en text $i", "en", "s")) ++
        (91 to 100).map(i => (i.toLong, s"fr texte $i", "fr", "s")))
    val mix = CurationModels.temperatureMix(spark, dir).cache()
    val byLang = mix.groupBy($"lang")
      .agg(count(lit(1)).as("docs"), sum($"n_copies").as("copies"),
        max($"repeat_factor").as("r"))
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    // dominant language emits FEWER copies than docs, rare language MORE
    assert(byLang("en")._3 < byLang("en")._2)
    assert(byLang("fr")._3 > byLang("fr")._2)
    // repeat factors bracket 1 from the right sides
    assert(byLang("en")._4 < 1.0 && byLang("fr")._4 > 1.0)
    // every doc's copy count is the floor or ceil of its repeat factor
    val bad = mix.filter(
      $"n_copies" =!= floor($"repeat_factor") &&
        $"n_copies" =!= floor($"repeat_factor") + 1).count()
    assert(bad == 0)
    // stochastic rounding conserves mass in expectation; with 10-90
    // docs per stratum the md5 buckets can deviate by a few — bound
    // loosely (the EXACT per-doc contract is the floor/ceil assertion
    // above plus the driver's oracle hash)
    for ((_, (_, docs, copies, r)) <- byLang)
      assert(math.abs(copies - docs * r) <= docs * 0.5 + 1)
    // deterministic: a re-run reproduces the exact index
    val again = CurationModels.temperatureMix(spark, dir)
    assert(mix.collect().map(_.toString).sorted.toSeq ==
      again.collect().map(_.toString).sorted.toSeq)
    mix.unpersist()
  }

  test("c05: streams pack independently per (lang, shard)") {
    // same doc sizes in two languages: offsets restart per stream
    // (raw packer, same rationale as the geometry test above; per-doc
    // token vocabularies are disjoint so nothing could trim anyway)
    def doc(id: Long, n: Int) = (1 to n).map(i => s"d${id}w$i").mkString(" ")
    val docs = Seq(
      (1L, doc(1, 10), "en", "s"), (2L, doc(2, 10), "en", "s"),
      (3L, doc(3, 10), "zh", "s"), (4L, doc(4, 10), "zh", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    val out = CurationModels.packSequencesFrom(docs)
      .select($"lang", $"doc_id", $"start_offset")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out == Seq(("en", 1L, 0L), ("en", 2L, 10L),
      ("zh", 3L, 0L), ("zh", 4L, 10L)))
  }
}
