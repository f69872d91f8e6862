package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — the same bootstrap the production
  * entry points use (`GraftSession`), so specs exercise the session
  * shape Verify/Bench actually run with (planner rule + functions
  * installed). Specs that need Spark's NATIVE planning (to show what a
  * query would do WITHOUT the engine's rule) use [[bare]].
  */
object TestSpark {
  lazy val spark: SparkSession =
    GraftSession.create("local[4]", 4, "graft-test")

  /** A rule-free sibling session (shared SparkContext, fresh session
    * state): no extraOptimizations, for before/after rewrite specs. */
  lazy val bare: SparkSession = spark.newSession()
}

/** Fixture helpers shared by the curation/pipeline specs. Since the
  * funnel gained the c11 embedding-space leg, every documents.parquet
  * fixture dir the funnel reads also needs an embeddings.parquet.
  */
object TestFixtures {
  /** Write an embeddings.parquet covering every doc_id in `dir`'s
    * documents table: ids present in the real sf0.001 embeddings keep
    * their real vector; appended ids (above the snapshot) get doc 1's
    * vector — a TRAIN-side, c11-unflagged donor at sf0.001, so
    * appended docs stay semantically clean and existing verdict
    * expectations hold. */
  def embeddingsFor(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val donor = broadcast(emb.filter(col("vec_id") === 1L)
      .select(col("embedding").as("donor_emb"),
        col("label").as("donor_label")))
    docs.join(emb, docs("doc_id") === emb("vec_id"), "left")
      .crossJoin(donor)
      .select(col("doc_id").as("vec_id"),
        coalesce(col("embedding"), col("donor_emb")).as("embedding"),
        coalesce(col("label"), col("donor_label")).as("label"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  /** One-hot embeddings for handcrafted tiny fixtures: doc i gets unit
    * basis vector e_(i mod 64), so distinct docs (with distinct slots)
    * have cosine 0 — no accidental c11 flags — while two docs SHARING
    * a slot have cosine 1 (how a spec plants a semantic duplicate). */
  def oneHotEmbeddingsFor(spark: SparkSession, dir: String,
      slotOf: Long => Int = id => (id % 64).toInt): Unit = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ids = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id")).as[Long].collect().toSeq
    ids.map { id =>
      val v = Array.fill(64)(0.0f); v(slotOf(id)) = 1.0f
      (id, v.toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
