package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.DedupModels
import graft.streaming.StreamingSpanTrim

/** The streamed span-trim twin must emit EXACTLY the removal positions
  * the batch incremental trims by (for batches without new-vs-new
  * cross-document duplicate grams — the documented division of labor),
  * and the spans they merge into must reproduce the batch-trimmed
  * corpus row for row.
  */
class StreamingSpanTrimSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed removal positions ≡ batch incremental trim verdicts") {
    val docs0 = graft.catalog.Tables.documents(spark, sfDir)
    // the materialized corpus gram table the pipeline would hold
    val knownGrams = DedupModels.spanGramsOf(docs0)
      .select($"g").distinct().cache()

    // appended batch: a verbatim historical duplicate (every window
    // known → fully trimmed), a fresh doc (nothing removed), and a
    // within-doc repeat (the 10-token phrase's second occurrence —
    // and only it — removed). No gram is shared between 9002 and 9003,
    // honoring the twin's no-new-vs-new-duplicates contract.
    val oldText = docs0
      .filter(size(DedupModels.normTokens($"text")) >= 12)
      .orderBy($"doc_id").select($"text").head().getString(0)
    val fresh = (1 to 19).map(i => s"fy$i").mkString(" ")
    val phrase = (1 to 10).map(i => s"qq$i").mkString(" ")
    val repText = phrase + " " + phrase
    val newRows = Seq(
      (9001L, oldText, "en", "srcA"),
      (9002L, fresh, "en", "srcB"),
      (9003L, repText, "en", "srcC"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))

    val inDir = Files.createTempDirectory("graft-spantrim-in").toString
    newRows.write.mode("overwrite").parquet(inDir)

    val ckpt = Files.createTempDirectory("graft-spantrim-ckpt").toString
    val out = Files.createTempDirectory("graft-spantrim-out").toString
    val q = StreamingSpanTrim.runAvailableNow(
      spark, inDir, knownGrams, ckpt, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
      .select($"doc_id", $"i").as[(Long, Int)].collect().toSet

    // the batch incremental's verdicts over the same batch + keepers
    val newGrams = DedupModels.spanGramsOf(newRows)
    val knownG = knownGrams.join(
      newGrams.select($"g").distinct(), Seq("g"), "left_semi")
    val expected = DedupModels
      .removalPositionsOf(newGrams, Some(knownG))
      .select($"doc_id", $"i").as[(Long, Int)].collect().toSet
    assert(streamed == expected,
      s"only-streamed=${(streamed -- expected).take(5)}, " +
        s"only-batch=${(expected -- streamed).take(5)}")

    // semantics of the fixture, asserted directly: the historical copy
    // loses every window, the fresh doc none, the within-doc repeat
    // exactly its second phrase occurrence
    val oldWindows = newGrams.filter($"doc_id" === 9001L).count()
    assert(oldWindows > 0 &&
      streamed.count(_._1 == 9001L).toLong == oldWindows)
    assert(!streamed.exists(_._1 == 9002L))
    assert(streamed.filter(_._1 == 9003L).map(_._2) == Set(10))

    // and the streamed spans trim to the same corpus rows the batch
    // incremental would append
    val streamedSpans = DedupModels.mergeRemovalSpans(
      spark.read.parquet(out).select($"doc_id", $"i"))
    val viaStream = DedupModels.trimmedCorpusFrame(newRows, streamedSpans)
      .collect().toSet
    val viaBatch = DedupModels.trimmedCorpusFrame(newRows,
      DedupModels.mergeRemovalSpans(
        DedupModels.removalPositionsOf(newGrams, Some(knownG))))
      .collect().toSet
    assert(viaStream == viaBatch)

    // the TRIMMED-corpus stream emits those same documents-schema rows
    // DIRECTLY (in-row trim + doc-keyed reassembly — no batch job in
    // the loop): row-for-row equality with trimmedCorpusFrame on the
    // same no-new-vs-new contract
    val ckpt2 = Files.createTempDirectory("graft-spantrim-ckpt2").toString
    val out2 = Files.createTempDirectory("graft-spantrim-out2").toString
    val q2 = StreamingSpanTrim.runTrimAvailableNow(
      spark, inDir, knownGrams, ckpt2, out2)
    q2.awaitTermination()
    val streamedDocs = spark.read.parquet(out2)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect().toSet
    val batchDocs = DedupModels.trimmedCorpusFrame(newRows,
      DedupModels.mergeRemovalSpans(
        DedupModels.removalPositionsOf(newGrams, Some(knownG))))
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .collect().toSet
    assert(streamedDocs == batchDocs,
      s"only-streamed=${(streamedDocs -- batchDocs).take(3)}, " +
        s"only-batch=${(batchDocs -- streamedDocs).take(3)}")
    // the fully-known historical copy must stream out EMPTY, the fresh
    // doc byte-identical
    val byId = streamedDocs.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(9001L) == "")
    assert(byId(9002L) == fresh)
    knownGrams.unpersist()
  }
}
