package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.{ActivityModels, CurationModels, TextModels}

/** Round-9 operator semantics the oracle proves cross-engine but not
  * meaningful: t10's scrubber precision/recall corners on hand-built
  * strings, c09's content-keyed split invariants (duplicates can never
  * straddle splits), and q46's spine completeness / zero-fill algebra.
  */
class PiiSplitGapfillSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def scrubOne(s: String): String =
    Seq(s).toDF("t").select(TextModels.scrubPii($"t")).as[String].head()

  test("t10 scrubber: true positives of all four classes") {
    assert(scrubOne("mail bob.smith+x@foo-bar.co ok") == "mail <EMAIL> ok")
    assert(scrubOne("from 10.0.255.1 today") == "from <IP> today")
    assert(scrubOne("pan 4111111111111111 used") == "pan <CARD> used")
    assert(scrubOne("call 555-867-5309 now") == "call <PHONE> now")
  }

  test("t10 scrubber: negatives stay untouched") {
    // 12-digit run: below the 13-digit card floor
    assert(scrubOne("id 123456789012 x") == "id 123456789012 x")
    // digits embedded mid-word: no boundary, no match
    assert(scrubOne("abc4111111111111111def") == "abc4111111111111111def")
    // 4-3-4 phone shape: first group too long
    assert(scrubOne("x 5551-867-5309 y") == "x 5551-867-5309 y")
    // bare '@' with spaces is not an address
    assert(scrubOne("not an email @ example com") == "not an email @ example com")
  }

  test("t10 scrubber: documented recall-first behavior on version quads") {
    // dotted quads match the IP shape by design (recall over precision)
    assert(scrubOne("ver 1.2.3.4 rc") == "ver <IP> rc")
  }

  test("c09: byte-equal duplicates always land in the same split") {
    // 60 docs over 20 distinct texts (3 ids each), two langs
    val docs = (0 until 60).map { i =>
      (i.toLong, s"alpha beta text ${i % 20} gamma",
        if (i % 2 == 0) "en" else "de")
    }.toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length($"text").cast("long"))
    val out = CurationModels.leakageSafeSplitFrom(docs)
      .select($"split", $"lang", $"n_docs", $"n_unique_fp", $"n_dup_docs")
      .as[(String, String, Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 60L)
    assert(out.forall(r => Set("train", "val", "test")(r._1)))
    assert(out.forall(r => r._5 == r._3 - r._4))
    // split is a function of fp, so each (fp, lang) pair is unique in
    // exactly one rollup row — the unique-fp total must equal the
    // number of distinct (content, lang) pairs in the input
    val expect = (0 until 60).map(i => (s"alpha beta text ${i % 20} gamma",
      if (i % 2 == 0) "en" else "de")).distinct.size
    assert(out.map(_._4).sum == expect.toLong,
      "every distinct (content, lang) is counted in exactly one split")
  }

  test("c10: a REPHRASED near-dup (different fingerprint) cannot straddle splits") {
    // doc 0 and doc 3 share 15 of their 18 shingles (one token edited)
    // — different content fingerprints, same d07 cluster; the other
    // docs are vocabulary-disjoint singletons in another lang
    val a = (0 until 20).map(i => s"alpha$i").mkString(" ")
    val b = (0 until 19).map(i => s"alpha$i").mkString(" ") + " edited"
    val rows = Seq(
      (0L, a, "en", "s"), (3L, b, "en", "s"),
      (10L, "beta0 beta1 beta2 beta3", "de", "s"),
      (11L, "gamma0 gamma1 gamma2 gamma3", "de", "s"))
    val dir = java.nio.file.Files.createTempDirectory("graft-c10").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // precondition: the pair really is one d07 component
    val comp = graft.models.DedupModels.nearDupClusters(spark, dir)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(comp.map(_._1).toSeq == Seq(0L, 3L) &&
      comp.forall(_._2 == 0L),
      s"docs 0 and 3 must form one near-dup component: ${comp.toSeq}")
    val out = CurationModels.nearDupSafeSplit(spark, dir)
      .select($"split", $"lang", $"n_docs", $"n_groups",
        $"n_clustered_docs")
      .as[(String, String, Long, Long, Long)].collect()
    // both clustered docs land in ONE (split, lang) row, as one group
    val en = out.filter(_._2 == "en")
    assert(en.length == 1 && en.head._3 == 2 && en.head._4 == 1 &&
      en.head._5 == 2,
      s"the near-dup pair must travel together: ${out.toSeq}")
    assert(out.map(_._3).sum == 4L)
  }

  test("q46: complete spine, zero-filled gaps, conserved totals") {
    val sfDir = "/root/testdata/sf0.001"
    val out = ActivityModels.hourlyGapfill(spark, sfDir)
      .select($"bucket_us", $"event_type", $"n_events", $"is_gap")
      .as[(Long, String, Long, Boolean)].collect()
    val e = graft.catalog.Tables.events(spark, sfDir)
    val nTypes = e.select($"event_type").distinct().count()
    val hourUs = 3600L * 1000000L
    val (mn, mx) = e.select(
      (min(unix_micros($"ts")) / hourUs).cast("long") * hourUs,
      (max(unix_micros($"ts")) / hourUs).cast("long") * hourUs)
      .as[(Long, Long)].head()
    val span = (mx - mn) / hourUs + 1
    assert(out.length == nTypes * span, "one row per (type, hour) slot")
    assert(out.forall(r => r._4 == (r._3 == 0L)), "is_gap <=> zero events")
    assert(out.map(_._3).sum == e.count(), "event mass is conserved")
    assert(out.exists(_._4), "the sf0.001 fixture has genuine gaps")
  }
}
