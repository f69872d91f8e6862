package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Loader contract for the corpus tables (`Tables.documents` /
  * `Tables.embeddings`): integer widths and the embedding element type
  * are canonicalized, so a regenerated parquet with narrowed/widened
  * writer types is invisible downstream — and on the CURRENT physical
  * schemas the guard is a structural no-op (no cast node, pushdown
  * untouched).
  */
class CorpusLoaderSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("drifted writer types normalize to the canonical schema") {
    val base = Files.createTempDirectory("graft-corpus").toString
    // documents with doc_id/n_chars narrowed to int32
    graft.catalog.Tables.documents(spark, sfDir).limit(50)
      .withColumn("doc_id", $"doc_id".cast("int"))
      .withColumn("n_chars", $"n_chars".cast("int"))
      .write.parquet(s"$base/documents.parquet")
    // embeddings with vec_id narrowed, label widened, elements doubled
    graft.catalog.Tables.embeddings(spark, sfDir).limit(50)
      .withColumn("vec_id", $"vec_id".cast("int"))
      .withColumn("label", $"label".cast("long"))
      .withColumn("embedding", $"embedding".cast(ArrayType(DoubleType)))
      .write.parquet(s"$base/embeddings.parquet")

    val docs = graft.catalog.Tables.documents(spark, base)
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    assert(docs.count() == 50)

    val emb = graft.catalog.Tables.embeddings(spark, base)
    assert(emb.schema("vec_id").dataType == LongType)
    assert(emb.schema("label").dataType == IntegerType)
    assert(emb.schema("embedding").dataType == ArrayType(FloatType))
    // values survive the round trip (spot: ids match the staged slice)
    assert(emb.agg(countDistinct($"vec_id")).head().getLong(0) == 50)
  }

  test("on the current testdata the guard adds no cast to the plan") {
    for (name <- Seq("documents", "embeddings")) {
      val via =
        if (name == "documents") graft.catalog.Tables.documents(spark, sfDir)
        else graft.catalog.Tables.embeddings(spark, sfDir)
      val raw = graft.catalog.Tables.load(spark, sfDir, name)
      assert(via.schema == raw.schema, name)
      assert(!via.queryExecution.analyzed.toString.toLowerCase
        .contains("cast("), s"$name: unexpected cast node")
    }
  }
}
