package graft.runner

import org.apache.spark.sql.{SaveMode, SparkSession}
import graft.catalog.Tables
import graft.models.SimilarityModels

/** Materialized IVF-PQ index maintenance — the ANN analog of
  * [[CurationPipeline]]: where s06 derives its index inside one query,
  * a production vector store maintains the index as WAREHOUSE TABLES
  * and appends to it, because at 100 TB you never re-encode the corpus
  * to serve one batch of new vectors. Three tables:
  *
  *   - `ann_coarse_codebook`  (cid, cv, cnorm) — 16 rows, frozen
  *   - `ann_pq_codebook`      (pcid, m, pcent) — 128 rows, frozen
  *   - `ann_codes`            (vec_id, cell, m, code) — 8 rows/vector,
  *                            the 4-byte-per-vector searchable index
  *
  * [[run]] is the offline (re)train + full encode: codebooks are
  * trained exactly as s06's query trains them (deterministic Lloyd
  * k-means over the fixed `AnnTrainCap` vec_id prefix — coarse cosine
  * cells, then per-subspace L2 residual centroids), then one corpus
  * pass encodes every vector. [[runIncremental]] is the append path:
  * read BOTH codebooks back frozen, encode only vectors above the
  * ann_codes vec_id watermark, append. Frozen codebooks are what make
  * appended rows immutable AND the search side stable — the ADC lookup
  * tables a query builds against the materialized codebooks score old
  * and new codes identically (FAISS's add-after-train contract).
  *
  * Incremental ≡ full holds exactly (AnnIndexPipelineSpec): appended
  * vec_ids exceed every snapshot id AND the training cap, so k-means
  * over the union reads the same training sample the snapshot run
  * froze. A drifted corpus (codebooks no longer
  * representative → recall decay) is the signal for a fresh [[run]] —
  * the retrain-vs-append trade every production ANN service runs.
  *
  * Scale: an incremental run costs O(new vectors × constant codebook)
  * with one broadcast of the 16+128-row codebooks — no shuffle of the
  * existing index, no corpus re-scan; the append is partition-local.
  */
object AnnIndexPipeline {
  final case class Report(codebookCells: Long, pqCentroids: Long,
      codedVectors: Long)
}

final class AnnIndexPipeline(spark: SparkSession, warehouseDir: String) {
  import spark.implicits._
  import AnnIndexPipeline.Report

  def targetPath(name: String): String = s"$warehouseDir/$name"

  private def report(): Report = Report(
    codebookCells =
      spark.read.parquet(targetPath("ann_coarse_codebook")).count(),
    pqCentroids = spark.read.parquet(targetPath("ann_pq_codebook")).count(),
    codedVectors = spark.read.parquet(targetPath("ann_codes"))
      .select($"vec_id").distinct().count())

  /** Offline train + full encode over the snapshot: REAL k-means
    * codebooks (deterministic fixed-iteration Lloyd over the fixed
    * `SimilarityModels.AnnTrainCap` training prefix — the bounded
    * train-on-sample FAISS runs before `add`), then one corpus pass
    * encodes every vector against the materialized (frozen) books. */
  def run(sfDir: String): Report = {
    val base = SimilarityModels.doubledEmb(Tables.embeddings(spark, sfDir))
    SimilarityModels.coarseCodebook(base, SimilarityModels.IvfPqCells)
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("ann_coarse_codebook"))
    val cents = spark.read.parquet(targetPath("ann_coarse_codebook"))
    SimilarityModels.residualCodebook(base, cents)
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("ann_pq_codebook"))
    SimilarityModels.encodeAgainst(
        SimilarityModels.residualSubs(
          SimilarityModels.cellTop2(base, cents), cents),
        spark.read.parquet(targetPath("ann_pq_codebook")))
      // exact per-vector norm + metadata label beside the codes
      // (adcSearch's cosine denominator + the filtered-search design:
      // predicate columns live in the index, never joined from the
      // corpus at query time)
      .join(base.select($"vec_id", $"norm".as("vnorm")), Seq("vec_id"))
      .join(Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"label"), Seq("vec_id"))
      .write.mode(SaveMode.Overwrite).parquet(targetPath("ann_codes"))
    report()
  }

  /** ADC top-k search over the MATERIALIZED index — the serving path:
    * codebooks and the code table are read back from the warehouse, the
    * query frame is anything with (vec_id, embedding) columns, and no
    * full-precision corpus vector is touched (only the 4-byte codes).
    * Identical algebra to the s06 query's inline derivation —
    * AnnIndexPipelineSpec pins search-over-materialized byte-identical
    * to `SimilarityModels.ivfPqAnnTopK`. */
  def search(queries: org.apache.spark.sql.DataFrame, k: Int = 5)
      : org.apache.spark.sql.DataFrame =
    SimilarityModels.adcSearch(
      SimilarityModels.doubledEmb(queries),
      spark.read.parquet(targetPath("ann_coarse_codebook")),
      spark.read.parquet(targetPath("ann_pq_codebook")),
      spark.read.parquet(targetPath("ann_codes")), k)

  /** Append-only catch-up: encode vectors above the index watermark
    * against the FROZEN materialized codebooks. */
  def runIncremental(sfDir: String): Report = {
    val codes = spark.read.parquet(targetPath("ann_codes"))
    // max over an EMPTY codes table (a run() over an empty snapshot) is
    // null — encode everything rather than throw
    val wmRow = codes.agg(org.apache.spark.sql.functions.max($"vec_id")).head()
    val wm = if (wmRow.isNullAt(0)) Long.MinValue else wmRow.getLong(0)
    val newBase = SimilarityModels.doubledEmb(
      Tables.embeddings(spark, sfDir).filter($"vec_id" > wm))
    val cents = spark.read.parquet(targetPath("ann_coarse_codebook"))
    val pqCents = spark.read.parquet(targetPath("ann_pq_codebook"))
    SimilarityModels.encodeAgainst(
        SimilarityModels.residualSubs(
          SimilarityModels.cellTop2(newBase, cents), cents),
        pqCents)
      .join(newBase.select($"vec_id", $"norm".as("vnorm")), Seq("vec_id"))
      .join(Tables.embeddings(spark, sfDir)
        .select($"vec_id", $"label").filter($"vec_id" > wm), Seq("vec_id"))
      .write.mode(SaveMode.Append).parquet(targetPath("ann_codes"))
    report()
  }
}
