package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{DedupModels, TextModels}

/** d08 segment dedup + t07 unigram scoring semantics on handcrafted
  * corpora — the sub-document keep/drop rule and LM-score algebra the
  * DuckDB oracle proves cross-engine but can't prove MEANS the right
  * thing. Covers: boilerplate shared across distinct docs (the case
  * whole-doc dedup misses), exact duplicate docs (first occurrence
  * keeps everything, the copy keeps nothing), segment conservation, and
  * unigram-score ordering (common-token docs outscore rare-token docs).
  */
class SegmentDedupSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-segdedup").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(ws: String*): String = ws.mkString(" ")
  // a 10-token segment of distinct filler, parameterized so docs differ
  private def seg(tag: String): String =
    (0 until 10).map(i => s"$tag$i").mkString(" ")

  test("d08: shared boilerplate drops from the later doc only") {
    // doc 0 and doc 1 are DIFFERENT documents sharing one 10-token
    // header segment — d01-style whole-doc dedup keeps both copies of
    // the header; d08 must keep it once (in doc 0) and drop it in doc 1
    val header = seg("hdr")
    val dir = docsDir(Seq(
      (0L, words(header, seg("bodyA")), "en", "s"),
      (1L, words(header, seg("bodyB")), "en", "s")))
    val out = DedupModels.segmentDedup(spark, dir)
      .select($"doc_id", $"n_segments", $"dup_segments", $"kept_tokens")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((0L, 2L, 0L, 20L)), s"doc 0: ${out(0)}")
    assert(out(1) == ((1L, 2L, 1L, 10L)), s"doc 1: ${out(1)}")
  }

  test("d08: an exact duplicate doc retains nothing; the original everything") {
    val text = words(seg("aa"), seg("bb"), "tail one two")
    val dir = docsDir(Seq((0L, text, "en", "s"), (5L, text, "en", "s")))
    val rows = DedupModels.segmentDedup(spark, dir)
      .select($"doc_id", $"dup_segments", $"n_segments", $"retained_ratio")
      .as[(Long, Long, Long, java.math.BigDecimal)].collect().sortBy(_._1)
    assert(rows(0)._2 == 0L && rows(0)._4.doubleValue() == 1.0)
    assert(rows(1)._2 == rows(1)._3, "every segment of the copy is a dup")
    assert(rows(1)._4.doubleValue() == 0.0)
  }

  test("d08: segment/token conservation on the real corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val out = DedupModels.segmentDedup(spark, sfDir)
    // segments cover the doc exactly: ceil(n_tokens / 10) segments and
    // kept + dropped tokens can never exceed the doc's token count
    val badGeom = out.filter(
      $"n_segments" =!= ceil($"n_tokens" / 10.0).cast("long") ||
        $"kept_tokens" > $"n_tokens" || $"dup_segments" > $"n_segments")
      .count()
    assert(badGeom === 0)
    // exactly one keeper per distinct segment hash corpus-wide
    val docs = graft.catalog.Tables.documents(spark, sfDir)
    val segCount = out.agg(sum($"n_segments" - $"dup_segments")).as[Long].head()
    val distinctHashes = docs
      .select($"doc_id",
        split(lower(trim(regexp_replace($"text", "\\s+", " "))), " ").as("toks"))
      .select(explode(sequence(lit(0),
        (ceil(size($"toks") / 10.0) - 1).cast("int"))).as("g"), $"toks")
      .select(md5(concat_ws(" ", slice($"toks", $"g" * 10 + 1, lit(10)))).as("h"))
      .distinct().count()
    assert(segCount === distinctHashes,
      s"keepers $segCount != distinct segments $distinctHashes")
  }

  test("t07: common-token docs outscore rare-token docs; scores are negative") {
    // 'common' appears 20×, 'rare' once each → doc 0's avg logprob must
    // be strictly greater (less negative) than doc 1's
    val dir = docsDir(Seq(
      (0L, (0 until 20).map(_ => "common").mkString(" "), "en", "s"),
      (1L, words("rare1", "rare2", "rare3", "rare4"), "en", "s")))
    val rows = TextModels.unigramLogprob(spark, dir)
      .select($"doc_id", $"avg_logprob")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(rows(0)._2 > rows(1)._2)
    assert(rows.forall(_._2 < 0.0))
  }

  test("t07: per-doc token counts and the ln(p) upper bound hold on the real corpus") {
    val sfDir = "/root/testdata/sf0.001"
    val out = TextModels.unigramLogprob(spark, sfDir)
    val docs = graft.catalog.Tables.documents(spark, sfDir)
    assert(out.count() === docs.count(), "one score row per document")
    // avg_logprob can never beat the most frequent token's own logprob
    val tok = docs.select(explode(
      split(lower(trim(regexp_replace($"text", "\\s+", " "))), " ")).as("t"))
    val counts = tok.groupBy($"t").count()
    val total = counts.agg(sum($"count")).as[Long].head()
    val maxCnt = counts.agg(max($"count")).as[Long].head()
    val bound = math.log(maxCnt.toDouble / total)
    val viol = out.filter($"avg_logprob" > lit(bound) + lit(1e-6)).count()
    assert(viol === 0, s"avg_logprob above the best-token bound $bound")
  }

  test("t11: the NB classifier separates the reference slice from the rest") {
    // positive class = the EvalSource slice ("src0"); its vocabulary is
    // disjoint from the negative docs', so every src0 doc must score a
    // strictly positive avg llr and every other doc strictly negative
    val dir = docsDir(Seq(
      (0L, words("good", "clean", "prose", "good"), "en", "src0"),
      (1L, words("clean", "prose", "good", "text"), "en", "src0"),
      (2L, words("spam", "noise", "junk", "spam"), "en", "web"),
      (3L, words("noise", "junk", "spam", "blob"), "en", "web")))
    val rows = TextModels.nbQualityScore(spark, dir)
      .select($"doc_id", $"avg_llr", $"is_quality")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 4)
    assert(rows.take(2).forall(r => r._2 > 0 && r._3),
      s"reference docs must score positive: ${rows.toSeq}")
    assert(rows.drop(2).forall(r => r._2 < 0 && !r._3),
      s"non-reference docs must score negative: ${rows.toSeq}")
  }

  test("t12: BPE learns the hand-computable merge sequence and stops when dry") {
    // vocab {aaab: 2, ab: 1}:
    //   round 1: (a,a) weight 4 (two overlapping positions × freq 2)
    //            beats (a,b) weight 3; greedy merge "a a a b" -> "aa a b"
    //   round 2: (a,b) weight 3 beats (aa,a) weight 2
    //   round 3: (aa,ab) weight 2 — a MERGED symbol pairs with another
    //   then every word is one symbol: training stops short of 8 rounds
    val dir = docsDir(Seq(
      (0L, "aaab aaab", "en", "s"), (1L, "ab", "en", "s")))
    val out = TextModels.bpeMerges(spark, dir)
      .select($"merge_round", $"left_sym", $"right_sym", $"merged",
        $"pair_count")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", "a", "aa", 4L),
      (2L, "a", "b", "ab", 3L),
      (3L, "aa", "ab", "aaab", 2L)),
      s"unexpected merge table: ${out.toSeq}")
  }

  test("t13: applying the merges compresses to whole-word tokens on the toy corpus") {
    // after t12's three merges both vocabulary words are single
    // symbols, so every corpus word encodes to exactly one BPE token
    val dir = docsDir(Seq(
      (0L, "aaab aaab", "en", "s"), (1L, "ab", "en", "s")))
    val out = TextModels.bpeTokenize(spark, dir)
      .select($"lang", $"n_words", $"n_chars", $"n_bpe_tokens",
        $"tokens_per_word_micros")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("en", 3L, 10L, 3L, 1000000L)),
      s"unexpected tokenization accounting: ${out.toSeq}")
  }

  test("d10: a boundary-straddling duplicated passage is a merged span d08 can't see") {
    // a 12-token passage shared by two docs at DIFFERENT offsets: the
    // fixed 10-token segment grid (d08) slices it differently in each
    // doc, so no segment matches — but the overlapping-window tier
    // must merge its three duplicated 10-windows into one 12-token
    // span in each doc
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words((1 to 5).map(i => s"fa$i").mkString(" "), p,
        (1 to 10).map(i => s"fb$i").mkString(" ")), "en", "s"),
      (1L, words(p, (1 to 8).map(i => s"g$i").mkString(" ")), "en", "s")))
    val spans = DedupModels.dupSpans(spark, dir)
      .select($"doc_id", $"n_dup_windows", $"n_spans", $"dup_tokens",
        $"max_span")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(spans.toSeq == Seq((0L, 3L, 1L, 12L, 12L), (1L, 3L, 1L, 12L, 12L)),
      s"unexpected span accounting: ${spans.toSeq}")
    // and the fixed segment grid indeed sees nothing (why d10 exists)
    val segDups = DedupModels.segmentStatsOf(
      DedupModels.markFirstOccurrence(DedupModels.segmentsOf(
        graft.catalog.Tables.documents(spark, dir))))
      .agg(sum($"dup_segments")).as[Long].head()
    assert(segDups == 0L, "the grid must miss the straddling passage")
  }

  test("d10: a passage repeated WITHIN one document registers both spans") {
    val p = (1 to 11).map(i => s"q$i").mkString(" ")
    val dir = docsDir(Seq(
      (0L, words(p, (1 to 10).map(i => s"mid$i").mkString(" "), p), "en", "s")))
    val spans = DedupModels.dupSpans(spark, dir)
      .select($"n_spans", $"dup_tokens", $"max_span")
      .as[(Long, Long, Long)].collect()
    assert(spans.toSeq == Seq((2L, 22L, 11L)),
      s"within-doc repetition must yield two 11-token spans: ${spans.toSeq}")
  }

  test("t14: eval-like docs outscore eval-unlike docs and fill the top slice") {
    // target slice (src0) speaks "quality prose" bigrams; doc 10 reuses
    // those exact bigrams (importance should be high), docs 11-18 share
    // none (low). With 9 raw docs the top ⌈10%⌉ = 1 slot must go to
    // doc 10.
    val q = "quality prose reads well and flows cleanly through ideas"
    val dir = docsDir(Seq(
      (0L, q, "en", "src0"),
      (1L, q + " with careful structure", "en", "src0"),
      (10L, "quality prose reads well and flows cleanly", "en", "web")) ++
      (11L to 18L).map(i =>
        (i, (0 until 8).map(j => s"junk$i$j").mkString(" "), "en", "web")))
    val rows = TextModels.dsirImportance(spark, dir)
      .select($"doc_id", $"avg_lr", $"selected")
      .as[(Long, Double, Boolean)].collect().sortBy(_._1)
    assert(rows.length == 9, "all raw docs with >=1 bigram are scored")
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId(10L)._2 > 0, "eval-like doc must carry positive weight")
    assert((11L to 18L).forall(byId(_)._2 < byId(10L)._2),
      "eval-unlike docs must score below the eval-like doc")
    assert(byId(10L)._3 && rows.count(_._3) == 1,
      "exactly the one top-slice slot, and it goes to the eval-like doc")
  }

  test("t13 oracle: the w-chain passes through when a round goes dry") {
    // When training dries up before BpeRounds (the toy corpora above),
    // b{r} is EMPTY — a CROSS JOIN there would zero out w{r} and every
    // later CTE, so the oracle would return no rows while the Spark
    // side keeps the final segmentation (a cross-engine divergence on
    // degenerate corpora, ADVICE r9). The oracle must LEFT JOIN b{r}
    // ON TRUE and keep s unchanged when no merge exists. Cross-engine
    // parity on a fully-merged 2-word corpus was replayed through
    // Verify + DuckDB when this guard landed; this pins the SQL shape
    // so a rewrite can't silently reintroduce the CROSS JOIN.
    val sql = TextModels.bpeTokenizeOracle
    assert(sql.contains("LEFT JOIN b"), "w-chain must LEFT JOIN the merge pick")
    assert(sql.contains("WHEN pair IS NULL THEN s"),
      "segmentation must pass through unchanged on a dry round")
    assert(!sql.contains("CROSS JOIN b"), "no zero-row cascade")
  }

  test("t13: corpus invariants — tokens never exceed characters, never beat words") {
    val rows = TextModels.bpeTokenize(spark, "/root/testdata/sf0.001")
      .select($"n_words", $"n_chars", $"n_bpe_tokens")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((w, c, t) <- rows) {
      assert(t <= c, "a BPE token is at least one character")
      assert(t >= w, "a word is at least one BPE token")
      assert(t < c, "eight merges must compress SOMETHING per language")
    }
  }
}
