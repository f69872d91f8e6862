package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.TextModels

/** t16 TF-IDF keyword semantics on a handcrafted corpus — the scoring
  * and ranking the DuckDB oracle proves cross-engine but can't prove
  * MEANS the right thing: a term repeated in one doc and absent
  * elsewhere outranks a corpus-wide term, corpus-universal terms score
  * exactly 0 (ln N/N), and the per-doc keep is capped at TfidfK with
  * (score desc, term asc) ties.
  */
class TfidfSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-tfidf").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("t16: rare repeated term outranks common term; universal term scores 0") {
    // N=3. df: apple=1 banana=2 cherry=2 durian=1 the=3
    val dir = docsDir(Seq(
      (0L, "the apple apple banana"),
      (1L, "the banana cherry"),
      (2L, "the cherry cherry cherry durian")))
    val out = TextModels.tfidfKeywords(spark, dir)
      .select($"doc_id", $"term_rank", $"term", $"tf", $"df",
        $"score".cast("double"))
      .as[(Long, Long, String, Long, Long, Double)]
      .collect().sortBy(r => (r._1, r._2))

    val d0 = out.filter(_._1 == 0L)
    // apple: tf=2, idf=ln(3)≈1.098612 → 2.197224; banana: ln(1.5)≈0.405465
    assert(d0.map(_._3).toSeq == Seq("apple", "banana", "the"), d0.toSeq)
    assert(math.abs(d0(0)._6 - 2.197224) < 1e-9, d0(0))
    // "the" is in every doc: idf = ln(3/3) = 0 exactly
    assert(d0(2)._6 == 0.0, d0(2))

    val d2 = out.filter(_._1 == 2L)
    // cherry: 3·ln(1.5)=1.216395 beats durian: 1·ln(3)=1.098612
    assert(d2.map(_._3).toSeq == Seq("cherry", "durian", "the"), d2.toSeq)
    assert(d2.forall(_._2 <= 3L))
  }

  test("t16: equal scores break ties by term ascending; cap at TfidfK") {
    // doc 0 has four distinct singleton terms (same tf=1, same df=1
    // ⇒ identical scores): only the 3 alphabetically-first survive
    val dir = docsDir(Seq(
      (0L, "zeta alpha mid beta"),
      (1L, "filler words here")))
    val d0 = TextModels.tfidfKeywords(spark, dir)
      .filter($"doc_id" === 0L)
      .orderBy($"term_rank")
      .select($"term").as[String].collect().toSeq
    assert(d0 == Seq("alpha", "beta", "mid"), d0)
  }

  test("t16: df counts documents, not occurrences") {
    val dir = docsDir(Seq(
      (0L, "echo echo echo"),
      (1L, "echo other")))
    val dfs = TextModels.tfidfKeywords(spark, dir)
      .filter($"term" === "echo")
      .select($"doc_id", $"df").as[(Long, Long)].collect().toMap
    assert(dfs.values.toSet == Set(2L), dfs)
  }
}
