package graft.runner

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.catalog.Tables
import graft.models.{CurationModels, DedupModels, SimilarityModels}

/** The composed curated-corpus build — the LLM-training-data analog of
  * [[DailyPipeline]]: where the reference's manifest sequences
  * seed → models → replication over financial facts, a data-curation
  * run sequences
  *
  *   1. curation_funnel   per-document keep/drop verdicts (c06)
  *   2. curated_corpus    the kept documents, column-complete
  *   2b. curation_splits  leakage-safe train/val/test labels over the
  *                        kept docs (c09's doc-grain surface) — split
  *                        is a stateless content hash, so incremental
  *                        appends ≡ full-rebuild labels
  *   2c. span_trimmed_corpus  the SPAN-TRIMMED kept docs (d11): every
  *                        duplicated 10-token window occurrence except
  *                        its corpus-global first removed (Lee et al.
  *                        2022), with `curation_span_grams` (the
  *                        distinct window-gram set) as the bookkeeping
  *                        table incremental catch-ups verdict against
  *                        and `curation_span_bloom` as its megabyte
  *                        sidecar (definitely-new grams skip the exact
  *                        keeper probe — the segment-bloom pattern)
  *   3. curated_packing   sequence-packing index over the TRIMMED kept
  *                        set (c05) — packs only tokens a training run
  *                        would actually see
  *   3b. train_split_packing  the split labels' downstream SAMPLER
  *                        (c12): packing over ONLY train-labeled docs —
  *                        what actually feeds a training run; val/test
  *                        text can't enter it by construction
  *   4. segment_stats     sub-document segment-dedup stats (d08), with
  *                        `curation_segments` (first-occurrence holder
  *                        per distinct segment hash) as the bookkeeping
  *                        table incremental runs verdict against, and
  *                        `curation_segment_bloom` as its megabyte
  *                        bloom sidecar — incremental runs probe it
  *                        first (no false negatives) so the exact
  *                        keeper join only sees maybe-known segments
  *
  * with every stage MATERIALIZED to the warehouse dir, so downstream
  * consumers (and re-runs, and the packing stage itself) read tables
  * instead of re-deriving plans — the same architecture the incremental
  * runner gives the reference's model DAG. Every stage is deterministic
  * (md5-hash sampling, lexical tie-breaks), so a re-run over unchanged
  * input reproduces identical tables (CurationPipelineSpec).
  *
  * TWO RUN MODES, mirroring the runner's CTAS vs watermark semantics:
  *
  *  - [[run]] — full snapshot CTAS, which ALSO materializes the two
  *    bookkeeping tables incremental runs need: `curation_groups`
  *    (fingerprint → canonical doc) and `curation_eval_grams` (the
  *    fixed benchmark gram set).
  *  - [[runIncremental]] — a corpus is append-only: process ONLY the
  *    documents above the doc_id watermark, derive their stage flags
  *    (per-doc signals + contamination vs the materialized eval grams +
  *    duplicate status vs the materialized fingerprint groups), append
  *    their funnel rows and kept docs, and repack ONLY the
  *    (lang, shard) streams the new docs touched (dynamic partition
  *    overwrite — offsets restart per shard, so untouched streams are
  *    provably unchanged).
  *
  * Why emitted verdicts are IMMUTABLE under this watermark: new doc_ids
  * are strictly greater than every processed id, so a new member can
  * never become its fingerprint group's canonical (min id) — old
  * duplicate flags stand; per-doc signals (c02/c03) depend on nothing
  * else; and the eval slice is a FIXED reference (new eval docs are
  * rejected loudly — admitting them could flip old docs' contamination
  * and would require a historical re-verdict, i.e. a fresh [[run]]).
  *
  * Scale: the funnel is doc-keyed joins over linear stage outputs; the
  * curated corpus is one hash semi-join of the raw snapshot against the
  * kept ids; packing reads the materialized curated table with
  * shard-bounded window partitions. An incremental run's cost is
  * O(new docs + touched shards), never O(corpus). Nothing here holds
  * state on the driver beyond the per-stage row counts in the report.
  */
object CurationPipeline {
  /** The delete-count fields are zero except on [[CurationPipeline
    * .deleteDocs]] reports, where they surface the id-validation
    * guard's outcome (round-13 review): `requestedDeletes` distinct
    * ids in the batch, `validatedDeletes` of them entering the
    * tombstone log (verdicted or already tombstoned),
    * `droppedUnknownDeletes` unknown ids — a delete racing ingestion
    * (the doc exists upstream but was never verdicted) shows up here
    * and must be retried after the next catch-up, instead of being
    * silently discarded. */
  final case class Report(
      verdictCounts: Map[String, Long],
      curatedRows: Long,
      packedRows: Long,
      boundarySplitDocs: Long,
      trainPackedRows: Long,
      requestedDeletes: Long = 0L,
      validatedDeletes: Long = 0L,
      droppedUnknownDeletes: Long = 0L)
}

final class CurationPipeline(spark: SparkSession, warehouseDir: String) {
  import spark.implicits._

  def targetPath(name: String): String = s"$warehouseDir/$name"

  private def hadoopPath(p: String) = {
    val path = new org.apache.hadoop.fs.Path(p)
    (path, path.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }
  private def deletePath(p: String): Unit = {
    val (path, fs) = hadoopPath(p); fs.delete(path, true); ()
  }
  private def pathExists(p: String): Boolean = {
    val (path, fs) = hadoopPath(p); fs.exists(path)
  }
  /** Create an empty in-progress marker dir (idempotent). Laid down
    * BEFORE a keeper-table append begins, so a crash anywhere in the
    * append+fold+swap sequence leaves the marker and
    * [[recoverInterruptedBloomSwap]] rebuilds the sidecar from the
    * keeper table — the marker's presence, not its content, is the
    * signal (recovery never reads it; the later fold overwrites it). */
  private def touchMarker(p: String): Unit = {
    val (path, fs) = hadoopPath(p); fs.mkdirs(path); ()
  }

  /** The document-family delete log, deduped — the curation analog of
    * the ANN tier's `ann_tombstones`. PERMANENT: after [[deleteDocs]]
    * physically removes a doc's rows, the log is what keeps the
    * incremental append watermark monotone (deleting the highest
    * verdicted doc must not reopen the id range below it — a
    * still-present upstream copy would be re-ingested) and what
    * excludes a lagging upstream copy from the repair's corpus view.
    * Missing table (pre-delete warehouse) = empty — which is exactly
    * why the accessor runs [[SwapWrite.recover]] first: [[compact]]
    * rewrites this PERMANENT log via SwapWrite, and a crash between
    * its two renames leaves the dir absent with the only copy in the
    * `.swap-` sibling. Without recovery the missing→empty fallback
    * would silently drop the watermark and resurrect erased docs (the
    * round-13 review's high finding); recover is idempotent and a few
    * FileSystem.exists calls when there is no residue. */
  private def curationTombstones: DataFrame = {
    import org.apache.spark.sql.functions.col
    SwapWrite.recover(spark, targetPath("curation_tombstones"))
    if (pathExists(targetPath("curation_tombstones")))
      spark.read.parquet(targetPath("curation_tombstones"))
        .select(col("doc_id")).distinct()
    else spark.range(0).select(col("id").as("doc_id"))
  }

  /** Rebuild the bloom sidecar from the keeper table (used by [[run]]
    * and by interrupted-swap recovery — bitsets are reproducible, so a
    * rebuild ≡ the union-folded sidecar an uninterrupted swap lands). */
  private def rebuildSegmentBloom(): Unit = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(targetPath("curation_segments"))
      .agg(org.apache.spark.sql.functions.expr("bloom_agg(seg_hash)")
        .as("bloom"))
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_segment_bloom"))
  }

  /** Bloom sidecar over the distinct span-gram table — the span-trim
    * analog of [[rebuildSegmentBloom]]: lets incremental trims answer
    * "definitely never seen" for the bulk of a fresh batch's grams
    * in-row (no keeper-table scan at all when nothing collides; FP rate
    * degrades gracefully past the filter's ~800k-key design point but
    * never loses the no-false-negative guarantee — positives just pay
    * the exact join they would have paid without the sidecar). */
  private def rebuildSpanGramBloom(): Unit = {
    graft.functions.GraftFunctions.register(spark)
    spark.read.parquet(targetPath("curation_span_grams"))
      .agg(org.apache.spark.sql.functions.expr("bloom_agg(g)").as("bloom"))
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_span_bloom"))
  }

  /** A leftover `.tmp` dir means a prior incremental crashed between the
    * tmp write and the final sidecar rewrite — the sidecar may be STALE
    * relative to already-appended keepers (a stale sidecar loses the
    * no-false-negative guarantee). Rebuild it from its keeper table
    * (the source of truth), then clear the marker — independently for
    * the segment and span-gram sidecars. */
  private def recoverInterruptedBloomSwap(): Unit = {
    if (pathExists(targetPath("curation_segment_bloom.tmp"))) {
      rebuildSegmentBloom()
      deletePath(targetPath("curation_segment_bloom.tmp"))
    }
    if (pathExists(targetPath("curation_span_bloom.tmp"))) {
      rebuildSpanGramBloom()
      deletePath(targetPath("curation_span_bloom.tmp"))
    }
  }

  /** The span-trim stage tables built from the CURRENT curated corpus:
    * the trimmed corpus, the distinct window-gram bookkeeping table,
    * and its bloom sidecar. Shared by a full [[run]] (step 2c) and the
    * pre-span-warehouse bootstrap in [[runIncremental]]. The gram
    * stream is consumed by three branches (trim stats, trim probe,
    * distinct-gram set) — three pushed-down scans of the curated
    * parquet, never an executor cache (corpus-token grain). */
  private def buildSpanTables(): Unit = {
    val curatedDocs = Tables.documents(spark, targetPath("curated_corpus"))
    DedupModels.spanTrimmedFrom(curatedDocs)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${targetPath("span_trimmed_corpus")}/documents.parquet")
    DedupModels.spanGramsOf(curatedDocs).select($"g").distinct()
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_span_grams"))
    rebuildSpanGramBloom()
    deletePath(targetPath("curation_span_bloom.tmp"))
  }

  /** Packing index (step 3) + train-split sampler (step 3b) over the
    * TRIMMED corpus — offsets are positions in the cleaned training
    * stream, not the raw snapshot. packSequencesFrom (not
    * packSequences, which composes its own trim): the trim is already
    * materialized and trimming is NOT idempotent in general (removing
    * a span can make previously-separated tokens adjacent). The
    * rebalance hint clusters by the partition key before the
    * partitioned write (same rationale as IncrementalRunner
    * .rebalanced): without it every task writes a file into every
    * (lang, shard) dir it touches — tasks×streams tiny files at corpus
    * scale. The train sampler packs ONLY train-labeled docs (semi-join
    * against curation_splits), so val/test text can never enter the
    * packed training stream; offsets re-base over the train stream,
    * which is why it is a distinct table, not a filter of
    * curated_packing. */
  private def packTrimmedCorpus(): Unit = {
    CurationModels.packSequencesFrom(
      Tables.documents(spark, targetPath("span_trimmed_corpus")))
      .hint("rebalance", "lang", "shard")
      .write.mode(SaveMode.Overwrite).partitionBy("lang", "shard")
      .parquet(targetPath("curated_packing"))
    val trainIds = spark.read.parquet(targetPath("curation_splits"))
      .filter($"split" === "train").select($"doc_id")
    CurationModels.packSequencesFrom(
      Tables.documents(spark, targetPath("span_trimmed_corpus"))
        .join(trainIds, Seq("doc_id"), "left_semi"))
      .hint("rebalance", "lang", "shard")
      .write.mode(SaveMode.Overwrite).partitionBy("lang", "shard")
      .parquet(targetPath("train_split_packing"))
  }

  /** Compaction sweep over every flat append table this pipeline
    * writes — each incremental catch-up appends a task-count of small
    * part files, so periodic compaction (the runner's post-pipeline
    * sweep idiom) keeps reader file counts bounded. Row content is
    * untouched; the dot-tmp/swap contract makes an interrupted sweep
    * recoverable from either side ([[Compaction.compactFlat]]). */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024)
      : Map[String, Int] = {
    val flatTables = Seq(
      "curation_funnel",
      "curated_corpus/documents.parquet",
      "curation_splits",
      "span_trimmed_corpus/documents.parquet",
      "curation_span_grams",
      "segment_stats",
      "curation_segments",
      // the erasure log appends one small file set per delete batch;
      // folding it is safe because only the deduped ID SET matters
      "curation_tombstones")
    flatTables.flatMap(t =>
      Compaction.compactFlat(spark, targetPath(t), targetFileBytes)
        .map(t -> _)).toMap
  }

  private def report(): CurationPipeline.Report = {
    val funnel = spark.read.parquet(targetPath("curation_funnel"))
    val packed = spark.read.parquet(targetPath("curated_packing"))
    CurationPipeline.Report(
      verdictCounts = funnel.groupBy($"verdict").count()
        .as[(String, Long)].collect().toMap,
      curatedRows =
        Tables.documents(spark, targetPath("curated_corpus")).count(),
      packedRows = packed.count(),
      boundarySplitDocs = packed.filter($"boundary_split").count(),
      trainPackedRows = spark.read
        .parquet(targetPath("train_split_packing")).count())
  }

  /** Re-canonicalize fingerprint groups whose canonical is tombstoned
    * and repair the funnel verdicts from STORED per-doc flags against
    * the given post-tombstone corpus — steps 2–3 of [[deleteDocs]],
    * shared with [[run]] (a full rebuild over an upstream snapshot
    * that still contains tombstoned docs must exclude them — the log
    * is PERMANENT; round-13 review). Pure state derivation: detection
    * keys on the full log, not any particular batch, so re-runs (and
    * runs where the upstream already dropped the docs) land the
    * identical tables. Both table swaps ride [[SwapWrite]]. */
  private def repairVerdicts(corpus: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    SwapWrite.recover(spark, targetPath("curation_groups"))
    SwapWrite.recover(spark, targetPath("curation_funnel"))
    val funnel0 = spark.read.parquet(targetPath("curation_funnel"))
    val groups = spark.read.parquet(targetPath("curation_groups"))
    val fps = CurationModels.fingerprintsOf(corpus)
      .select($"doc_id", $"fp")
    val orphanFps = groups
      .join(curationTombstones
          .withColumnRenamed("doc_id", "canonical_doc_id"),
        Seq("canonical_doc_id"), "left_semi")
      .select($"fp")
    // smallest SURVIVING member founds the group anew; a group with no
    // survivor leaves the bookkeeping table
    val newCanon = fps
      .join(orphanFps.hint("broadcast"), Seq("fp"), "left_semi")
      .groupBy($"fp").agg(min($"doc_id").as("canonical_doc_id"))
    SwapWrite.overwrite(spark, targetPath("curation_groups"),
      groups.join(orphanFps, Seq("fp"), "left_anti")
        .unionByName(newCanon))
    // funnel repair: deleted rows leave; a surviving duplicate whose
    // canonical died re-verdicts (possibly to kept). Per-doc flags
    // (rep/contam/sem/sample) are immutable — no text reprocessing.
    val groupsNew = spark.read.parquet(targetPath("curation_groups"))
    val repaired = funnel0
      .join(curationTombstones, Seq("doc_id"), "left_anti")
      .join(fps, Seq("doc_id"))
      .join(groupsNew, Seq("fp"))
      .withColumn("is_duplicate", $"doc_id" =!= $"canonical_doc_id")
      .withColumn("verdict",
        when($"source" === CurationModels.EvalSource, "eval")
          .when($"is_duplicate", "duplicate")
          .when($"rep_flagged", "repetitive")
          .when($"contaminated", "contaminated")
          .when($"sem_contaminated", "sem_contaminated")
          .when(!$"sample_kept", "sampled_out")
          .otherwise("kept"))
      .select($"doc_id", $"lang", $"source", $"is_duplicate",
        $"rep_flagged", $"contaminated", $"sem_contaminated",
        $"sample_kept", $"verdict")
    SwapWrite.overwrite(spark, targetPath("curation_funnel"), repaired)
  }

  def run(sfDir: String): CurationPipeline.Report = {
    // --- 1. funnel verdicts
    CurationModels.curationFunnel(spark, sfDir)
      .write.mode(SaveMode.Overwrite).parquet(targetPath("curation_funnel"))
    // --- 1b. incremental bookkeeping: fingerprint groups + the fixed
    // eval gram reference (what runIncremental re-verdicts against)
    DedupModels.dedupExact(spark, sfDir)
      .select($"fingerprint".as("fp"), $"canonical_doc_id")
      .write.mode(SaveMode.Overwrite).parquet(targetPath("curation_groups"))
    CurationModels.evalGramsOf(Tables.documents(spark, sfDir))
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_eval_grams"))
    // 1c. the c11 (embedding-space) references: the trained coarse
    // codebook and the cell-assigned EVAL vectors. Both are frozen at
    // snapshot time for the same reason the gram set is — the codebook
    // trains on the fixed vec_id < AnnTrainCap prefix (appends land
    // above the watermark, so a full rebuild trains identically), and
    // admitting new eval vectors could flip old docs' flags
    val baseVecs = SimilarityModels
      .doubledEmb(Tables.embeddings(spark, sfDir))
    // the funnel's c11 leg already session-materialized the trained
    // index — reuse it (parquet round-trips doubles exactly, so the
    // frozen copy incremental runs read back assigns identically)
    graft.models.Shared.materialized("ivf_cents", spark, sfDir) {
      SimilarityModels.coarseCodebook(baseVecs)
    }.write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_ivf_cents"))
    val frozenCents = spark.read.parquet(targetPath("curation_ivf_cents"))
    graft.models.Shared.materialized("ivf_top2", spark, sfDir) {
      SimilarityModels.cellTop2(baseVecs, frozenCents)
    }.filter($"crk" === 1)
      .join(Tables.documents(spark, sfDir)
        .filter($"source" === CurationModels.EvalSource)
        .select($"doc_id"), $"vec_id" === $"doc_id")
      .select($"cid".as("cell"), $"vec_id".as("eval_id"),
        $"v".as("evv"), $"norm".as("en"))
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_eval_vecs"))
    // --- 1d. the tombstone log is PERMANENT — it survives full
    // rebuilds (round-13 review): an upstream snapshot that still
    // carries erased docs must not resurrect them, so the funnel/groups
    // built above (over the raw snapshot) repair against the log before
    // anything derives from them. A warehouse with no tombstones (the
    // common case, and every pre-erasure fixture) skips this entirely.
    // Epoch shard files need no purge here: [[deleteDocs]] already
    // regenerated them when the tombstones were logged.
    val corpus =
      if (curationTombstones.head(1).isEmpty)
        Tables.documents(spark, sfDir)
      else {
        val c = Tables.documents(spark, sfDir)
          .join(curationTombstones, Seq("doc_id"), "left_anti")
        repairVerdicts(c)
        c
      }
    // --- 2..4: every table derived from the verdicts + the raw corpus
    rebuildDerived(corpus)
    report()
  }

  /** Steps 2–4 of the build: regenerate every DERIVED table from the
    * CURRENT `curation_funnel` verdicts and the given raw corpus — the
    * shared tail of a full [[run]] and the [[deleteDocs]] repair.
    * Purely deterministic in (funnel, rawDocs), so a crash anywhere in
    * here is recovered by re-running the caller. */
  private def rebuildDerived(rawDocs: DataFrame): Unit = {
    val funnel = spark.read.parquet(targetPath("curation_funnel"))
    // --- 2. curated corpus: kept documents with all source columns,
    // written under a documents.parquet path so the corpus dir IS a
    // valid Tables-resolvable fixture layout for every downstream op
    val keptIds = funnel.filter($"verdict" === "kept").select($"doc_id")
    rawDocs
      .join(keptIds, Seq("doc_id"), "left_semi")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${targetPath("curated_corpus")}/documents.parquet")
    // --- 2b. split labels over the curated corpus: the leakage-safe
    // train/val/test assignment (c09's doc-grain surface) materialized
    // as a warehouse table downstream samplers read. Content-keyed and
    // stateless, so incremental appends reproduce exactly what a full
    // rebuild assigns (spec-pinned)
    CurationModels
      .splitLabelsFrom(Tables.documents(spark, targetPath("curated_corpus")))
      .write.mode(SaveMode.Overwrite).parquet(targetPath("curation_splits"))
    // --- 2c. span-trimmed corpus (d11): every duplicated 10-token
    // window occurrence except its corpus-global first is REMOVED
    // before packing (Lee et al. 2022's exact-substring trim), so the
    // duplicated mass d10 measures never reaches the packed training
    // stream. Alongside it, the distinct window-gram set — the
    // bookkeeping table incremental catch-ups verdict new windows
    // against (the span-grain analog of curation_segments: any new
    // occurrence of a known gram is non-first by the doc_id-watermark
    // argument, so old trimmed docs are immutable).
    buildSpanTables()
    // --- 3/3b. packing index + train sampler over the TRIMMED set
    packTrimmedCorpus()
    // --- 4. sub-document segment stage (d08): per-doc retained-token
    // stats over the RAW corpus, plus the bookkeeping table an
    // incremental run needs — the first-occurrence holder of every
    // distinct segment hash (the segment analog of curation_groups)
    val marked = DedupModels.markFirstOccurrence(
      DedupModels.segmentsOf(rawDocs))
    DedupModels.segmentStatsOf(marked)
      .write.mode(SaveMode.Overwrite).parquet(targetPath("segment_stats"))
    marked.filter(!$"dup").select($"seg_hash", $"doc_id", $"g")
      .write.mode(SaveMode.Overwrite)
      .parquet(targetPath("curation_segments"))
    // bloom sidecar over the keeper hashes: the megabyte summary that
    // lets incremental runs skip the corpus-sized keeper join for
    // definitely-new segments (bitsets are reproducible, so the sidecar
    // a full run writes ≡ the one incremental unions up — spec-pinned)
    rebuildSegmentBloom()
    // a rebuild supersedes any interrupted incremental swap
    deletePath(targetPath("curation_segment_bloom.tmp"))
  }

  /** Incremental catch-up over an appended corpus: `sfDir` now holds
    * the snapshot PLUS new documents (all with doc_id above the
    * processed watermark). Equivalent to one full [[run]] over the
    * union — CurationPipelineSpec pins table-level equality.
    */
  def runIncremental(sfDir: String): CurationPipeline.Report = {
    // the c11 leg's cell assignment runs double_dot (the driver may own
    // the session, so registration can't be assumed)
    graft.functions.GraftFunctions.register(spark)
    recoverInterruptedBloomSwap()
    // MIGRATION: a warehouse built before the span-trim stage existed
    // carries no span tables, and its packing tables were packed over
    // the UNtrimmed curated corpus. Bootstrap the span stage from the
    // already-curated corpus (old docs only at this point — nothing has
    // been appended yet) and repack both packing tables over the
    // trimmed corpus, exactly what a full run would have produced; the
    // normal catch-up then applies. One-time cost proportional to the
    // existing corpus — the alternative is a raw path-not-found
    // AnalysisException mid-catch-up.
    if (!pathExists(targetPath("curation_span_grams")) ||
      !pathExists(targetPath("span_trimmed_corpus")) ||
      !pathExists(targetPath("curation_span_bloom"))) {
      buildSpanTables()
      packTrimmedCorpus()
    }
    val funnelOld = spark.read.parquet(targetPath("curation_funnel"))
    // watermark over verdicts AND tombstones: after [[deleteDocs]]
    // physically removes the highest verdicted doc, the retained log
    // keeps the watermark monotone — a lagging upstream copy of a
    // deleted doc can never re-enter, and no processed id reprocesses
    val wm = funnelOld.select($"doc_id").unionByName(curationTombstones)
      .agg(org.apache.spark.sql.functions.max($"doc_id"))
      .head().getLong(0)
    val newDocs = Tables.documents(spark, sfDir).filter($"doc_id" > wm)
      .persist()
    try {
      // frozen-eval guard (see class scaladoc)
      val newEval = newDocs
        .filter($"source" === CurationModels.EvalSource).count()
      require(newEval == 0,
        s"$newEval new docs carry the eval source — the benchmark " +
          "reference is fixed; re-run the full snapshot to re-verdict " +
          "history against a changed eval set")

      // --- 1. verdicts for the new docs only
      val fps = CurationModels.fingerprintsOf(newDocs)
      val groups = spark.read.parquet(targetPath("curation_groups"))
      // canonical resolution: known group → its (older, smaller-id)
      // canonical stands; unseen fingerprint → min doc_id among the
      // new members founds the group
      val newGroupMin = fps.groupBy($"fp")
        .agg(org.apache.spark.sql.functions.min($"doc_id").as("new_min"))
      val canon = newGroupMin.join(groups, Seq("fp"), "left")
        .select($"fp",
          org.apache.spark.sql.functions
            .coalesce($"canonical_doc_id", $"new_min")
            .as("canonical_doc_id"),
          $"canonical_doc_id".isNull.as("founded"))
      val rep = CurationModels.repetitionSignalsFrom(newDocs)
        .select($"doc_id", $"flagged".as("rep_flagged"))
      val evalGrams = spark.read.parquet(targetPath("curation_eval_grams"))
      val cont = CurationModels.contaminationOf(newDocs, evalGrams)
        .select($"doc_id", $"flagged".as("cont_flagged"))
      // c11 flags for the new docs only: assign their vectors to the
      // FROZEN snapshot cells and compare against the FROZEN eval
      // vectors — a new doc's flag depends on nothing but itself and
      // the two references, so incremental ≡ full holds exactly
      val frozenCents = spark.read
        .parquet(targetPath("curation_ivf_cents"))
      val evalVecs = spark.read.parquet(targetPath("curation_eval_vecs"))
      // TRAIN-side vectors only, matching the batch path (which
      // excludes source == EvalSource before comparing): the frozen-
      // eval guard above already rejects eval-sourced appends loudly,
      // and this anti-join makes the contract structural — even if the
      // guard were bypassed, an eval-sourced new vector could never be
      // scored against the eval references (it would wrongly flag
      // itself sem_contaminated and diverge from a full rebuild)
      val newEvalIds = newDocs
        .filter($"source" === CurationModels.EvalSource)
        .select($"doc_id")
      val newVecs = SimilarityModels
        .doubledEmb(Tables.embeddings(spark, sfDir))
        .filter($"vec_id" > wm)
        .join(newEvalIds, $"vec_id" === newEvalIds("doc_id"), "left_anti")
      val sem = SimilarityModels.cellTop2(newVecs, frozenCents)
        .filter($"crk" === 1)
        .select($"cid".as("cell"), $"vec_id", $"v", $"norm")
        .join(evalVecs, Seq("cell"))
        .filter(org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.call_function(
            "double_dot", $"v", $"evv") / ($"norm" * $"en"), 6)
          >= SimilarityModels.SemContamTau)
        .select($"vec_id".as("doc_id")).distinct()
        .withColumn("sem_flag",
          org.apache.spark.sql.functions.lit(true))
      import org.apache.spark.sql.functions._
      val samp = CurationModels.stratifiedSampleFrom(newDocs)
        .select($"doc_id", $"kept")
      val newFunnel = fps
        .join(canon.select($"fp", $"canonical_doc_id"), Seq("fp"))
        .join(rep, Seq("doc_id"), "left")
        .join(cont, Seq("doc_id"), "left")
        .join(sem, Seq("doc_id"), "left")
        .join(samp, Seq("doc_id"))
        .withColumn("is_duplicate", $"doc_id" =!= $"canonical_doc_id")
        .withColumn("rep_flagged", coalesce($"rep_flagged", lit(false)))
        .withColumn("contaminated", coalesce($"cont_flagged", lit(false)))
        .withColumn("sem_contaminated", coalesce($"sem_flag", lit(false)))
        .withColumn("sample_kept", $"kept")
        .withColumn("verdict",
          when($"source" === CurationModels.EvalSource, "eval")
            .when($"is_duplicate", "duplicate")
            .when($"rep_flagged", "repetitive")
            .when($"contaminated", "contaminated")
            .when($"sem_contaminated", "sem_contaminated")
            .when(!$"sample_kept", "sampled_out")
            .otherwise("kept"))
        .select($"doc_id", $"lang", $"source", $"is_duplicate",
          $"rep_flagged", $"contaminated", $"sem_contaminated",
          $"sample_kept", $"verdict")
        .persist()
      newFunnel.write.mode(SaveMode.Append)
        .parquet(targetPath("curation_funnel"))
      // newly-founded fingerprint groups join the bookkeeping table
      canon.filter($"founded")
        .select($"fp", $"canonical_doc_id")
        .write.mode(SaveMode.Append).parquet(targetPath("curation_groups"))

      // --- 2. append the new kept docs to the curated corpus
      val keptNewIds = newFunnel.filter($"verdict" === "kept")
        .select($"doc_id")
      newDocs.join(keptNewIds, Seq("doc_id"), "left_semi")
        .write.mode(SaveMode.Append)
        .parquet(s"${targetPath("curated_corpus")}/documents.parquet")

      // --- 2b. split labels for the new kept docs (stateless content
      // hash — appended labels ≡ full-rebuild labels)
      CurationModels
        .splitLabelsFrom(newDocs.join(keptNewIds, Seq("doc_id"), "left_semi"))
        .write.mode(SaveMode.Append).parquet(targetPath("curation_splits"))

      // --- 2c. span-trim catch-up: trim ONLY the new kept docs. A new
      // window is removed if its gram is already in the historical gram
      // table (its first holder has a smaller doc_id — old trimmed docs
      // are therefore IMMUTABLE, the same watermark argument as the
      // funnel verdicts) or if it repeats within this batch beyond the
      // batch's first occurrence; removalPositionsOf encodes exactly
      // that, so appended trims ≡ full-rebuild trims (spec-pinned).
      //
      // The known-gram probe is two-tier, mirroring the segment stage:
      // the megabyte BLOOM SIDECAR answers "definitely new" in-row (a
      // constant-folded plan literal — no false negatives), so the
      // exact semi-join against the CORPUS-sized gram table sees only
      // the maybe-known slice, BROADCAST against the streamed keeper
      // scan; when a fresh batch shares nothing with the corpus the
      // maybe-known set is empty and AQE's empty-relation propagation
      // eliminates the keeper scan outright. At 100 TB that is the
      // difference between re-reading a multi-TB gram table every
      // catch-up and reading nothing.
      graft.functions.GraftFunctions.register(spark)
      val newKept = newDocs.join(keptNewIds, Seq("doc_id"), "left_semi")
      val newGrams = DedupModels.spanGramsOf(newKept)
      val spanBloom = spark.read
        .parquet(targetPath("curation_span_bloom"))
        .head().getAs[Array[Byte]]("bloom")
      val newGramSet = newGrams.select($"g").distinct()
        .withColumn("maybe_known",
          call_function("bloom_contains", lit(spanBloom), $"g"))
        .persist()
      try {
        val knownG = spark.read.parquet(targetPath("curation_span_grams"))
          .join(newGramSet.filter($"maybe_known").select($"g")
            .hint("broadcast"), Seq("g"), "left_semi")
        DedupModels.trimmedCorpusFrame(newKept,
          DedupModels.mergeRemovalSpans(
            DedupModels.removalPositionsOf(newGrams, Some(knownG))))
          .write.mode(SaveMode.Append)
          .parquet(s"${targetPath("span_trimmed_corpus")}/documents.parquet")
        // unseen batch grams join the bookkeeping table: bloom-negative
        // grams are PROVABLY unseen and skip the exact check; the
        // maybe-known slice anti-joins the (small) confirmed set
        val unseen = newGramSet.filter(!$"maybe_known").select($"g")
          .unionByName(newGramSet.filter($"maybe_known").select($"g")
            .join(knownG, Seq("g"), "left_anti"))
          .persist()
        try {
          // marker BEFORE the keeper append: a crash between the append
          // and the sidecar swap would otherwise leave a stale bloom
          // with no recovery signal — later catch-ups would read the
          // appended grams as definitely-new and duplicated spans would
          // silently survive
          touchMarker(targetPath("curation_span_bloom.tmp"))
          unseen.write.mode(SaveMode.Append)
            .parquet(targetPath("curation_span_grams"))
          // fold the unseen grams into the sidecar (reproducible
          // bitsets: OR ≡ full rebuild), two-step tmp swap as for the
          // segment sidecar — a leftover tmp marks an interrupted swap
          spark.read.parquet(targetPath("curation_span_bloom"))
            .select($"bloom")
            .unionByName(unseen.agg(expr("bloom_agg(g)").as("bloom")))
            .agg(expr("bloom_merge_agg(bloom)").as("bloom"))
            .write.mode(SaveMode.Overwrite)
            .parquet(targetPath("curation_span_bloom.tmp"))
          spark.read.parquet(targetPath("curation_span_bloom.tmp"))
            .write.mode(SaveMode.Overwrite)
            .parquet(targetPath("curation_span_bloom"))
          deletePath(targetPath("curation_span_bloom.tmp"))
        } finally unseen.unpersist()
      } finally newGramSet.unpersist()

      // --- 3. repack ONLY the (lang, shard) streams the new kept docs
      // touched; every other stream's rows are byte-identical (offsets
      // restart per shard) and stay in place via dynamic partition
      // overwrite
      val touched = newDocs.join(keptNewIds, Seq("doc_id"), "left_semi")
        .select($"lang",
          expr(s"doc_id div ${CurationModels.PackShard}").as("shard"))
        .distinct()
      // repack reads the TRIMMED corpus (what a full run packs)
      val curated = Tables.documents(spark, targetPath("span_trimmed_corpus"))
      val touchedDocs = curated
        .withColumn("shard",
          expr(s"doc_id div ${CurationModels.PackShard}"))
        .join(touched, Seq("lang", "shard"), "left_semi")
        .drop("shard")
      CurationModels.packSequencesFrom(touchedDocs)
        .hint("rebalance", "lang", "shard") // one clustered file set per touched stream
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang", "shard")
        .parquet(targetPath("curated_packing"))

      // --- 3b. sampler catch-up: repack only the TRAIN streams the new
      // TRAIN-labeled docs touched (labels for the new kept docs landed
      // in step 2b; a doc's label is a stateless content hash, so the
      // stream membership of old docs is immutable and untouched train
      // streams stay byte-identical under dynamic partition overwrite)
      val trainIds = spark.read.parquet(targetPath("curation_splits"))
        .filter($"split" === "train").select($"doc_id")
      val touchedTrain = newDocs.join(keptNewIds, Seq("doc_id"), "left_semi")
        .join(trainIds, Seq("doc_id"), "left_semi")
        .select($"lang",
          expr(s"doc_id div ${CurationModels.PackShard}").as("shard"))
        .distinct()
      val touchedTrainDocs = curated
        .join(trainIds, Seq("doc_id"), "left_semi")
        .withColumn("shard",
          expr(s"doc_id div ${CurationModels.PackShard}"))
        .join(touchedTrain, Seq("lang", "shard"), "left_semi")
        .drop("shard")
      CurationModels.packSequencesFrom(touchedTrainDocs)
        .hint("rebalance", "lang", "shard")
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("lang", "shard")
        .parquet(targetPath("train_split_packing"))

      // --- 4. segment stage catch-up: only the NEW docs' segments are
      // hashed; a new copy drops if its hash is already held by the
      // materialized first-occurrence table OR by an earlier (doc_id, g)
      // within this batch. Old docs' stats are immutable for the same
      // reason as the funnel verdicts — new doc_ids exceed every
      // processed id, so no new segment can unseat an existing keeper.
      //
      // The BLOOM SIDECAR makes the keeper lookup scale: the megabyte
      // filter (a constant-folded plan literal, probed codegen-free but
      // heapified once per task) answers "definitely new" with no false
      // negatives, so the exact join against the CORPUS-sized keeper
      // table runs only over the maybe-known slice — at 100 TB that is
      // the difference between shuffling a multi-TB table every catch-up
      // and shuffling kilobytes. Cost: O(new segments) map-side probes
      // + one hash join over the bloom-positive subset.
      graft.functions.GraftFunctions.register(spark)
      val bloomBytes = spark.read
        .parquet(targetPath("curation_segment_bloom"))
        .head().getAs[Array[Byte]]("bloom")
      val segsNew = DedupModels.markFirstOccurrence(
        DedupModels.segmentsOf(newDocs))
        .withColumn("maybe_known",
          call_function("bloom_contains", lit(bloomBytes), $"seg_hash"))
        .persist()
      try {
        val keepers = spark.read.parquet(targetPath("curation_segments"))
          .select($"seg_hash", lit(true).as("known"))
        // exact join ONLY over the bloom-positive slice; bloom-negative
        // rows are PROVABLY unseen (no false negatives) and skip it
        val checked = segsNew.filter($"maybe_known")
          .join(keepers, Seq("seg_hash"), "left")
          .withColumn("dup", $"dup" || coalesce($"known", lit(false)))
          .drop("known")
        val fresh = segsNew.filter(!$"maybe_known")
        val markedNew = checked.unionByName(fresh).drop("maybe_known")
        DedupModels.segmentStatsOf(markedNew)
          .write.mode(SaveMode.Append).parquet(targetPath("segment_stats"))
        val newKeepers = markedNew.filter(!$"dup")
          .select($"seg_hash", $"doc_id", $"g")
        // marker BEFORE the keeper append (same ordering contract as the
        // span sidecar): the whole append+fold+swap sequence is covered
        // by recoverInterruptedBloomSwap
        touchMarker(targetPath("curation_segment_bloom.tmp"))
        newKeepers.write.mode(SaveMode.Append)
          .parquet(targetPath("curation_segments"))
        // fold the new keepers into the sidecar: OR of reproducible
        // bitsets ≡ the filter a full rebuild would write
        spark.read.parquet(targetPath("curation_segment_bloom"))
          .select($"bloom")
          .unionByName(newKeepers
            .agg(expr("bloom_agg(seg_hash)").as("bloom")))
          .agg(expr("bloom_merge_agg(bloom)").as("bloom"))
          .write.mode(SaveMode.Overwrite)
          .parquet(targetPath("curation_segment_bloom.tmp"))
        // two-step swap: the overwrite above cannot target the table it
        // reads, so land in a tmp dir and rewrite; drop the tmp dir
        // afterwards (a leftover tmp is the interrupted-swap marker
        // recoverInterruptedBloomSwap rebuilds from)
        spark.read.parquet(targetPath("curation_segment_bloom.tmp"))
          .write.mode(SaveMode.Overwrite)
          .parquet(targetPath("curation_segment_bloom"))
        deletePath(targetPath("curation_segment_bloom.tmp"))
      } finally segsNew.unpersist()
      newFunnel.unpersist()
      report()
    } finally newDocs.unpersist()
  }

  /** EPOCH SHARD-FILE WRITER + dataloader manifest — the step that
    * turns the c15 permutation into files a training dataloader can
    * actually stream, composing c12 (only train-split text feeds a
    * run) and c05/c13 packing geometry (fixed `PackBudget`-token
    * sequence windows) WITH the epoch order:
    *
    *   - the span-trimmed corpus is restricted to train-labeled docs
    *     (the c12 guarantee: val/test text cannot enter a shard file
    *     by construction);
    *   - `CurationModels.epochShuffleFrom` assigns every doc its
    *     deterministic (shard, shard_pos) for this epoch at the given
    *     production geometry (`shards` = corpus_docs / docs-per-file);
    *   - offsets/sequence windows are computed over the EPOCH-ordered
    *     stream per shard (running token sum in shard_pos order) — the
    *     numbers a sequential reader of the shard file sees;
    *   - each shard lands as ONE ordered parquet file under
    *     `epoch_shards/epoch=<e>/shard=<s>/` (rows stored in shard_pos
    *     order: the writer task iterates the sorted partition), each
    *     row carrying the document PAYLOAD (trimmed text + lang)
    *     beside its geometry so a sequential dataloader streams the
    *     file with no further joins, and a
    *     manifest row per shard (docs, tokens, sequence windows) lands
    *     in `epoch_shard_manifest` under dynamic partition overwrite —
    *     re-running an epoch replaces exactly its own files and rows.
    *
    * Scale: the permutation is a stateless map; the per-shard sort IS
    * the single-task stream a shard-file writer needs anyway (shard
    * count grows with the corpus, so per-task volume stays bounded);
    * the manifest is one map-side-combined rollup. Returns the
    * manifest rows for the epoch. EpochShardWriterSpec pins file
    * order ≡ c15 permutation, offsets, idempotency, and epoch
    * separation. */
  def writeEpochShards(epoch: Long,
      shards: Long = CurationModels.EpochShards)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val trainDocs = trainTrimmedDocs()
    val packed = CurationModels.epochPackedFrom(
      CurationModels.epochShuffleFrom(trainDocs, epoch, shards))
      // the PAYLOAD rides the shard row (trimmed text beside the
      // geometry), so a sequential dataloader streams the file with no
      // further joins — the point of materializing shards at all
      .join(trainDocs.select($"doc_id", $"text", $"lang"), Seq("doc_id"))
    // one writer task per shard => one ordered data file per shard dir
    packed
      .select($"shard", $"shard_pos", $"doc_id", $"lang", $"text",
        $"n_tokens", $"start_offset", $"first_seq", $"last_seq",
        $"boundary_split")
      .repartition(math.max(1, shards.toInt), $"shard")
      .sortWithinPartitions($"shard", $"shard_pos")
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(targetPath(s"epoch_shards/epoch=$epoch"))
    publishOrDropEpoch(epoch, shards)
  }

  /** Publish the epoch's manifest partition from its written files —
    * or, when the write emitted NO shards (empty train split; an
    * erasure that removed the epoch's last docs), drop the epoch dir
    * and its manifest partition instead of reading an empty
    * partitioned dir (which throws) and returns the empty manifest
    * frame. Shared tail of [[writeEpochShards]] and
    * [[rewriteEpochShards]]. */
  private def publishOrDropEpoch(epoch: Long, geometry: Long)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val (epochDir, fs) = hadoopPath(targetPath(s"epoch_shards/epoch=$epoch"))
    val anyShard = fs.exists(epochDir) &&
      fs.listStatus(epochDir).exists(st =>
        st.isDirectory && st.getPath.getName.startsWith("shard="))
    if (anyShard) publishEpochManifest(epoch, geometry)
    else {
      deletePath(targetPath(s"epoch_shards/epoch=$epoch"))
      deletePath(targetPath(s"epoch_shard_manifest/epoch=$epoch"))
      spark.range(0).select(lit(0L).as("epoch"), lit(0L).as("shard"),
        lit(0L).as("n_docs"), lit(0L).as("n_tokens"), lit(0L).as("n_seqs"),
        lit(0L).as("boundary_splits"),
        array(struct(lit(0L).as("seq"), lit(0L).as("row"),
          lit(0L).as("skip_tokens"))).as("cursors"))
    }
  }

  /** The span-trimmed corpus restricted to train-labeled docs — what
    * epoch shard files carry (the c12 guarantee: val/test text cannot
    * enter a shard by construction). */
  private def trainTrimmedDocs(): DataFrame = {
    val trainIds = spark.read.parquet(targetPath("curation_splits"))
      .filter($"split" === "train").select($"doc_id")
    Tables.documents(spark, targetPath("span_trimmed_corpus"))
      .join(trainIds, Seq("doc_id"), "left_semi")
  }

  /** Recompute and publish the manifest partition for one epoch FROM
    * THE WRITTEN SHARD FILES (shared by the full writer and the
    * erasure path's partial rewrite, so files and manifest can never
    * disagree), including the per-shard resume-cursor array
    * ([[CurationModels.epochCursorsFrom]]). One column-pruned scan of
    * the epoch's files — the payload column is never read. Returns the
    * epoch's manifest rows in canonical column order. */
  private def publishEpochManifest(epoch: Long, geometry: Long)
      : DataFrame = {
    import org.apache.spark.sql.functions._
    val rows = spark.read
      .parquet(targetPath(s"epoch_shards/epoch=$epoch"))
      .withColumn("shard", $"shard".cast("long"))
    CurationModels.epochManifestWithCursorsFrom(rows)
      .withColumn("epoch", lit(epoch))
      .select($"epoch", $"shard", $"n_docs", $"n_tokens", $"n_seqs",
        $"boundary_splits", $"cursors")
      // the GEOMETRY rides the persisted manifest (not the returned
      // frame): a small corpus can leave a shard empty, so counting
      // manifest rows under-reads the shard parameter — and the
      // erasure path must regenerate each epoch at its ORIGINAL
      // geometry (deleteDocs reads this column back)
      .withColumn("geometry", lit(geometry))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("epoch")
      .parquet(targetPath("epoch_shard_manifest"))
    // read-back from THIS epoch's partition dir (not the whole table:
    // a pre-cursor-era manifest partition lacking the cursors column
    // could win the cross-partition schema inference and break the
    // select; the dir just written has a uniform schema by
    // construction), restoring the canonical column order
    spark.read
      .parquet(targetPath(s"epoch_shard_manifest/epoch=$epoch"))
      .withColumn("epoch", lit(epoch))
      .select($"epoch", $"shard", $"n_docs",
        $"n_tokens", $"n_seqs", $"boundary_splits", $"cursors")
  }

  /** Regenerate ONLY the given shards of one materialized epoch — the
    * erasure path's scoped rewrite (round-13 "next" #1). Sound because
    * shards are INDEPENDENT by construction: a doc's shard is a pure
    * hash of (epoch, doc_id) ([[CurationModels.epochShardCol]] — the
    * writer's own assignment function), and shard_pos / offsets /
    * sequence windows are all computed per shard
    * ([[CurationModels.epochPackedFrom]] windows partition by shard),
    * so removing or changing docs in shard A cannot move any byte in
    * shard B. Untouched shard partitions keep their original FILES
    * (dynamic partition overwrite replaces only written partitions;
    * CurationErasureSpec pins byte-identity); a touched shard whose
    * docs all died has its partition dir deleted outright — dynamic
    * overwrite never rewrites a partition it emits no rows for, and a
    * stale payload-bearing dir is exactly what erasure must not leave.
    * The manifest partition then recomputes from the files. */
  private def rewriteEpochShards(epoch: Long, shards: Long,
      touched: Seq[Long]): Unit = {
    import org.apache.spark.sql.functions._
    val trainDocs = trainTrimmedDocs()
    // the shard IN-list filters BELOW the per-shard windows (predicate
    // on the window partition key), so only touched shards sort/pack
    // two consumers (the file write + the emptied-shard probe) read
    // the packed frame through a PARQUET SCRATCH, the family's own
    // discipline (erasure_doc_state precedent) — not an executor
    // cache: the frame is touched-shards-bounded, but nothing in an
    // erasure path should pin block-manager state when a scratch is
    // equivalent (round-14 review). Unconditionally overwritten before
    // any read, so leftovers from a killed rewrite are inert; deleted
    // on the way out.
    val scratchPath = targetPath("erasure_rewrite_scratch")
    CurationModels.epochPackedFrom(
      CurationModels.epochShuffleFrom(trainDocs, epoch, shards)
        .filter($"shard".isin(touched: _*)))
      .join(trainDocs.select($"doc_id", $"text", $"lang"), Seq("doc_id"))
      .select($"shard", $"shard_pos", $"doc_id", $"lang", $"text",
        $"n_tokens", $"start_offset", $"first_seq", $"last_seq",
        $"boundary_split")
      .write.mode(SaveMode.Overwrite).parquet(scratchPath)
    val packed = spark.read.parquet(scratchPath)
    packed
      .repartition(math.max(1, touched.size), $"shard")
      .sortWithinPartitions($"shard", $"shard_pos")
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard")
      .parquet(targetPath(s"epoch_shards/epoch=$epoch"))
    val nonEmpty = packed.select($"shard").distinct()
      .as[Long].collect().toSet
    touched.filterNot(nonEmpty).foreach { s =>
      deletePath(targetPath(s"epoch_shards/epoch=$epoch/shard=$s"))
    }
    deletePath(scratchPath)
    publishOrDropEpoch(epoch, shards): Unit
  }

  /** GDPR/takedown ERASURE through the curation document family — the
    * document analog of `AnnIndexPipeline.runDelete` + its compaction,
    * and the reference's repair semantics (`incremental_cleanup.py:
    * 78-88` deletes then re-fills) applied to the doc-keyed DAG. After
    * this returns, every curation table equals what a full [[run]]
    * over the corpus WITHOUT the deleted docs would have produced
    * (under the frozen snapshot references — eval grams/vectors and
    * the trained IVF codebook — exactly the contract [[runIncremental]]
    * already states; CurationErasureSpec pins table-level equality,
    * sidecars included):
    *
    *   1. ids are validated (only verdicted or already-tombstoned ids
    *      enter the log — an unknown id must not advance the append
    *      watermark) and appended to the PERMANENT `curation_tombstones`
    *      log, which [[runIncremental]]'s watermark honors so a deleted
    *      doc never resurrects even when the upstream copy lags;
    *   2. fingerprint groups whose canonical died are re-canonicalized
    *      to the smallest surviving member (one corpus fingerprint
    *      pass, restricted by a broadcast of the orphaned fps), or
    *      dropped when no member survives;
    *   3. the funnel is REPAIRED from stored per-doc flags: deleted
    *      rows leave, and a surviving duplicate whose canonical died
    *      re-verdicts (possibly to `kept` — it then enters the corpus
    *      exactly as a full rebuild would admit it). Flags themselves
    *      (rep/contam/sem/sample) are per-doc and immutable, so no
    *      text reprocessing happens here;
    *   4. every derived table regenerates via [[rebuildDerived]] —
    *      which is WHY the equality holds for the subtle cases: a
    *      deleted doc's span-gram and segment first-occurrence claims
    *      migrate to the next-smallest holder (possibly restoring
    *      previously-trimmed text in surviving docs), grams/segments
    *      held only by deleted docs leave the bookkeeping tables, and
    *      BOTH bloom sidecars rebuild from the new keeper tables — a
    *      deleted doc's first-occurrence claims are never consulted
    *      again. A surgical delta exists in principle, but first-
    *      occurrence migration makes other docs' trims change, so the
    *      regeneration IS the provably-equal path — and its cost (one
    *      derived-table refresh per erasure BATCH, run monthly, never
    *      per id) is the reference's own repair posture;
    *   5. every MATERIALIZED EPOCH SHARD set is brought to the
    *      post-delete corpus at its recorded geometry — shard rows
    *      carry the document payload, so they are the one surface
    *      erased text would otherwise survive on. SCOPED to what
    *      actually differs (round-13 "next" #1): each epoch is diffed
    *      against its OWN files on (doc_id, n_tokens) — the complete
    *      shard-row state, since trims always move the token count
    *      and raw text/lang are immutable — and only shards containing
    *      a differing doc rewrite. Shard membership is a pure hash of
    *      (epoch, doc_id) ([[CurationModels.epochShardCol]], the
    *      writer's own function) and all per-shard numbers are
    *      shard-local, so an undiffed shard is provably byte-identical
    *      and its file never moves. Diffing against the files (not a
    *      pre-repair snapshot) also folds in docs APPENDED since the
    *      epoch was written, so a purged epoch always equals one
    *      [[writeEpochShards]] emission over the current corpus —
    *      never a mix of corpus versions. Epoch dirs with NO manifest
    *      row (a writer that crashed before its manifest write) are
    *      unpublished payload and are deleted outright. (A mere
    *      append catch-up leaves epochs alone: staleness there means
    *      missing NEW docs, a trainer refresh decision — erasure must
    *      purge, retention is the violation.)
    *
    * Mutation safety: the log append lands first; groups and funnel
    * swap via [[SwapWrite]] (no crash point loses committed rows);
    * the derived tail is deterministic in (funnel, corpus), and the
    * epoch purge in (files, rebuilt tables). A crash anywhere is
    * recovered by RE-RUNNING deleteDocs with the same ids
    * (already-tombstoned ids stay valid, the repair re-derives from
    * current state — every step is idempotent, and step 5 carries no
    * cross-run state at all).
    *
    * `sfDir` is the current corpus snapshot; deleted docs may or may
    * not still be present in it (the log excludes them either way),
    * but every other verdicted doc must be.
    *
    * Full-estate erasure: a doc's VECTOR lives in the ANN tier's own
    * warehouse — pair this call with
    * `AnnIndexPipeline.runDelete(ids)` (vec_id = doc_id) to erase both
    * estates; the frozen `curation_ivf_cents`/`curation_eval_vecs`
    * references hold no per-corpus-doc payload (trained centroids and
    * the protected eval slice only), so they are not erasure
    * surfaces. */
  def deleteDocs(sfDir: String, ids: org.apache.spark.sql.DataFrame)
      : CurationPipeline.Report = {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    recoverInterruptedBloomSwap()
    SwapWrite.recover(spark, targetPath("curation_groups"))
    SwapWrite.recover(spark, targetPath("curation_funnel"))
    val funnel0 = spark.read.parquet(targetPath("curation_funnel"))
    val reqIds = ids.select($"doc_id".cast("long").as("doc_id")).distinct()
      .persist()
    val known = funnel0.select($"doc_id").unionByName(curationTombstones)
      .distinct()
    val delIds = reqIds.join(known, Seq("doc_id"), "left_semi").persist()
    try {
      // delete observability (round-13 review): the unknown-id guard
      // below is correctness-critical (an unverdicted id must not
      // advance the append watermark) but must not be SILENT — the
      // caller sees how many ids were dropped and retries them after
      // the next catch-up verdicts the docs
      val nRequested = reqIds.count()
      val nValid = delIds.count()
      def counted(r: CurationPipeline.Report): CurationPipeline.Report =
        r.copy(requestedDeletes = nRequested, validatedDeletes = nValid,
          droppedUnknownDeletes = nRequested - nValid)
      if (nValid == 0) return counted(report()) // nothing known to erase
      // frozen-eval guard: erasing an eval doc would change the
      // benchmark reference and silently flip history's contamination
      // flags — that requires an explicit fresh run(), not an erasure
      val evalDel = funnel0.join(delIds, Seq("doc_id"), "left_semi")
        .filter($"source" === CurationModels.EvalSource).count()
      require(evalDel == 0,
        s"$evalDel requested ids carry the eval source — the benchmark " +
          "reference is frozen; re-run the full snapshot instead")
      // 1. log first: from here the watermark is safe even if the
      // repair below crashes (re-run deleteDocs with the same ids)
      delIds.write.mode(SaveMode.Append)
        .parquet(targetPath("curation_tombstones"))
      // the logical post-delete corpus: processed docs minus the log
      val wm = funnel0.select($"doc_id").unionByName(curationTombstones)
        .agg(max($"doc_id")).head().getLong(0)
      val corpus = Tables.documents(spark, sfDir)
        .filter($"doc_id" <= wm)
        .join(curationTombstones, Seq("doc_id"), "left_anti")
      // 2-3. re-canonicalize orphaned fingerprint groups + repair the
      // funnel from stored flags (detection keys on the FULL log, not
      // this batch, so a crashed prior run's leftover orphans repair
      // too); shared with run()'s tombstone-honoring rebuild
      repairVerdicts(corpus)
      // 4. regenerate every derived table (incl. both bloom sidecars)
      // from the repaired verdicts over the post-delete corpus
      rebuildDerived(corpus)
      // 5. purge erased payload from the materialized epoch shard
      // files — each epoch diffed against its OWN files and scoped to
      // the shards that actually differ (see the class scaladoc);
      // purely derived from (files, rebuilt tables), so a crash
      // anywhere re-runs to the same result with no recovery protocol
      purgeEpochShards()
      counted(report())
    } finally { delIds.unpersist(); reqIds.unpersist(): Unit }
  }

  /** `epoch=N` partition dirs under `table` (for `epoch_shards`,
    * authoritative for PAYLOAD presence — the manifest can lag a
    * crashed writer; for the manifest table, guards the parquet read:
    * a fully-vacuumed manifest dir has no partitions left to infer a
    * schema from). */
  private def epochDirsOf(table: String): Seq[Long] = {
    val (root, fs) = hadoopPath(targetPath(table))
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
      .map(_.getPath.getName.stripPrefix("epoch=").toLong).sorted
  }
  private def diskEpochs(): Seq[Long] = epochDirsOf("epoch_shards")

  /** Step 5 of [[deleteDocs]]: bring every materialized epoch to the
    * CURRENT post-delete corpus (the same content [[writeEpochShards]]
    * would emit today — the round-13 posture), rewriting only the
    * shards that actually differ. Enumerates epochs from the manifest
    * AND the shard directory listing (round-13 review: a writer that
    * crashed between its file write and its manifest write leaves
    * payload the manifest doesn't know about — those unpublished dirs
    * are deleted outright).
    *
    * The diff base for each epoch is the epoch's OWN FILES, not a
    * snapshot: a shard row depends on nothing but its shard's
    * (doc_id, n_tokens) multiset in permutation order plus the doc's
    * immutable raw text/lang — so comparing the files'
    * (doc_id, n_tokens) against the current train-trimmed state
    * catches every way a shard can go stale THROUGH THE DOC SET or the
    * token counts: erased docs, re-admitted docs, trim restores, AND
    * docs appended by catch-ups since the epoch was written (a
    * snapshot diff missed the last class and could leave an epoch
    * mixing corpus versions — the round-14 self-review finding). One
    * documented blind spot (round-14 review, accepted): between an
    * epoch write and a purge, a span RESTORE from erasure (+k tokens)
    * and an independent new trim (−k tokens) on the SAME doc can
    * cancel to an identical n_tokens, leaving that stale shard
    * undetected. Erased docs themselves always diff on doc_id, so
    * erasure/GDPR semantics are unaffected; closing the edge would
    * mean carrying a content digest beside n_tokens on every shard
    * row and in epochDocState — deliberately not paid for a
    * token-count coincidence with no compliance consequence.
    * Purely derived from current
    * state: no scratch tables, no crash protocol, idempotent by
    * construction. Cost per epoch: one two-column pruned read of its
    * files (the payload column never loads) + the shared current
    * projection. */
  private def purgeEpochShards(): Unit = {
    import org.apache.spark.sql.functions._
    val manifested: Map[Long, Long] =
      if (epochDirsOf("epoch_shard_manifest").nonEmpty)
        spark.read.parquet(targetPath("epoch_shard_manifest"))
          .groupBy($"epoch".cast("long").as("e"))
          .agg(max($"geometry").as("g"))
          .as[(Long, Long)].collect().toMap
      else Map.empty
    diskEpochs().filterNot(manifested.contains).foreach { e =>
      deletePath(targetPath(s"epoch_shards/epoch=$e"))
    }
    if (manifested.isEmpty) return
    val (_, fs) = hadoopPath(targetPath("epoch_shards"))
    // the current (doc_id, n_tokens) projection, MATERIALIZED once for
    // all epochs (tokenization is the expensive half; a parquet
    // scratch, not an executor cache — corpus-row-grain. No crash
    // gating needed: it is unconditionally overwritten here before any
    // read, so leftover state from a killed purge is inert)
    val curPath = targetPath("erasure_doc_state")
    CurationModels.epochDocState(trainTrimmedDocs())
      .select($"doc_id", $"n_tokens".as("cur_tokens"))
      .write.mode(SaveMode.Overwrite).parquet(curPath)
    val cur = spark.read.parquet(curPath)
    manifested.toSeq.sortBy(_._1).foreach { case (e, g) =>
      val dirThere = fs.exists(
        new org.apache.hadoop.fs.Path(targetPath(s"epoch_shards/epoch=$e")))
      if (!dirThere) writeEpochShards(e, g): Unit // manifest row, no files
      else {
        val onDisk = spark.read
          .parquet(targetPath(s"epoch_shards/epoch=$e"))
          .select($"doc_id", $"n_tokens".as("old_tokens"))
        // changed = entered ∪ left ∪ token-count moved; shard
        // membership via the writer's own hash — corpus-free
        val touched = onDisk.join(cur, Seq("doc_id"), "full_outer")
          .filter(!($"old_tokens" <=> $"cur_tokens"))
          .select(CurationModels.epochShardCol(e, $"doc_id", g).as("s"))
          .distinct().as[Long].collect().toSeq.sorted
        if (touched.nonEmpty) rewriteEpochShards(e, g, touched)
      }
    }
    deletePath(curPath)
  }

  /** EPOCH RETENTION (round-13 "missing #2"): materialized epochs
    * carry the full train-split text payload and otherwise accumulate
    * forever. Drop every epoch NOT in `keep` — shard files and
    * manifest partition both — and return the dropped epoch numbers.
    * Kept epochs' files never move (byte-identity spec-pinned);
    * unpublished orphan dirs (no manifest row) count as droppable
    * epochs like any other. Idempotent: re-vacuuming with the same
    * keep set is a no-op returning empty. */
  def vacuumEpochs(keep: Seq[Long]): Seq[Long] = {
    val keepSet = keep.toSet
    val drop = (diskEpochs() ++ epochDirsOf("epoch_shard_manifest"))
      .distinct.filterNot(keepSet).sorted
    drop.foreach { e =>
      deletePath(targetPath(s"epoch_shards/epoch=$e"))
      deletePath(targetPath(s"epoch_shard_manifest/epoch=$e"))
    }
    drop
  }
}
