package graft.runner

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for FLAT parquet append dirs (data files
  * directly inside the dir — no partition subdirs), the shape every
  * CurationPipeline table has: each incremental catch-up appends a
  * task-count of small part files, so after N appends a
  * `curation_span_grams` or `span_trimmed_corpus` reader opens
  * O(N·tasks) files for megabytes of data. At warehouse scale that is
  * a NameNode/listing bottleneck and a reader-task explosion —
  * compaction folds each dir back to ~`targetFileBytes`-sized files.
  *
  * The rewrite rides the shared [[SwapWrite]] contract (round 13 —
  * previously a file-wise move protocol over `java.io.File`, which
  * silently did nothing correct on a non-local warehouse): the
  * coalesced rows land in a dot-prefixed sibling tmp, the live dir is
  * renamed ASIDE (never deleted) and the tmp renamed in, all through
  * the Hadoop `FileSystem`, so no crash point loses committed rows on
  * any filesystem. [[compactFlat]] runs [[SwapWrite.recover]] on
  * entry, so a killed sweep resolves on the next one
  * (CurationPipelineSpec pins the residue branches).
  *
  * Single-writer contract like every mutation in the runner: the swap
  * is crash-recoverable, not atomic for concurrent readers.
  */
object Compaction {

  /** One-time migration of PRE-round-13 compaction crash residue
    * (round-13 review): the previous protocol wrote the rewrite into a
    * `.compact-flat` subdir INSIDE the table dir (flat compaction) or
    * a `.delete-compact-<name>` SIBLING (the ANN physical prune), then
    * deleted the originals and moved the tmp files in. A warehouse
    * that crashed in the crash-after-delete state holds its ONLY copy
    * in that legacy tmp — which [[SwapWrite.recover]] does not
    * recognize, so without this branch the table reads as empty and
    * the stranded rows are never restored. Finish the old protocol's
    * move: if the live dir holds no data files and a legacy tmp does,
    * rename the tmp's data files in. When BOTH hold data files the
    * states are disambiguated by ROW CONTENT, never by listing alone
    * (see the branch comment — the old per-file move loop makes
    * "live non-empty" compatible with "tmp holds only-copies"). Runs
    * through the Hadoop FileSystem like everything else, and is a
    * no-op a few exists-calls cheap once no legacy residue remains. */
  def migrateLegacyResidue(spark: SparkSession, dirPath: String): Unit = {
    val dir = new Path(dirPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataFiles(d: Path) =
      if (!fs.exists(d)) Array.empty[Path]
      else fs.listStatus(d)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
    // every mutation below is a single WHOLE-DIRECTORY rename (or a
    // delete of a provable duplicate), never a per-file move loop: a
    // crash mid-loop would leave the live dir non-empty with the tmp
    // still holding only-copy files, and the re-run would then read
    // the live dir as authoritative and delete the tmp — losing rows
    // (the round-14 self-review finding). Rename-or-nothing keeps
    // every intermediate state re-enterable.
    val childTmp = new Path(dir, ".compact-flat")
    val siblingTmp = new Path(dir.getParent, s".delete-compact-${dir.getName}")
    // normalize the child-shape residue to the sibling shape first (one
    // atomic rename; the child cannot stay put — restoring the live dir
    // around it would otherwise require deleting its own parent)
    if (fs.exists(childTmp)) {
      if (dataFiles(childTmp).isEmpty) fs.delete(childTmp, true): Unit
      else {
        require(!fs.exists(siblingTmp),
          s"legacy compaction recovery: both $childTmp and $siblingTmp " +
            "exist with data — refusing to guess which holds the table")
        require(fs.rename(childTmp, siblingTmp),
          s"legacy compaction recovery: could not stage $childTmp aside")
      }
    }
    if (fs.exists(siblingTmp)) {
      if (dataFiles(siblingTmp).isEmpty)
        fs.delete(siblingTmp, true): Unit
      else if (dataFiles(dir).isEmpty) {
        // crash-AFTER-delete residue: the tmp holds the ONLY copy. Drop
        // the husk dir (no data files — just _SUCCESS/crc leftovers)
        // and rename the tmp into place; a crash between the two
        // re-enters cleanly (dir absent ⇒ dataFiles(dir) empty)
        if (fs.exists(dir)) fs.delete(dir, true): Unit
        require(fs.rename(siblingTmp, dir),
          s"legacy compaction recovery: could not restore $dir")
      } else {
        // BOTH dirs hold data files. The old protocols reach this state
        // two ways that a directory listing cannot tell apart
        // (round-14 review): crash-BEFORE-delete (tmp = a complete
        // rewrite, live authoritative — tmp is a dead duplicate) and
        // crash-MID-MOVE (the old per-file move loop emptied live, then
        // moved tmp files in one rename at a time — live holds the
        // moved prefix and the tmp holds the ONLY copies of the rest).
        // Deleting the tmp on listing evidence alone silently loses the
        // stranded rows in the second state, so reconcile by ROW
        // CONTENT (a one-time migration can afford the read):
        //  - tmp ⊆ live  → dead duplicate, drop the tmp;
        //  - live ⊆ tmp  → tmp supersedes (old mid-DELETE crash: some
        //    originals gone, tmp holds the full rewrite) — restore it;
        //  - disjoint    → mid-move: finish the old protocol's move
        //    (rename-per-file; a crash mid-loop re-enters this same
        //    branch and keeps converging);
        //  - anything else cannot arise from the legacy protocols →
        //    refuse loudly rather than guess (the childTmp collision
        //    posture).
        val live = spark.read.parquet(dirPath)
        val tmp = spark.read.parquet(siblingTmp.toString)
        val tmpExtra = tmp.exceptAll(live)
        val liveExtra = live.exceptAll(tmp)
        if (tmpExtra.isEmpty) fs.delete(siblingTmp, true): Unit
        else if (liveExtra.isEmpty) {
          fs.delete(dir, true): Unit
          require(fs.rename(siblingTmp, dir),
            s"legacy compaction recovery: could not restore $dir")
        } else if (tmp.intersectAll(live).isEmpty) {
          dataFiles(siblingTmp).foreach { f =>
            require(fs.rename(f, new Path(dir, f.getName)),
              s"legacy compaction recovery: could not move $f into $dir")
          }
          fs.delete(siblingTmp, true): Unit
        } else
          throw new IllegalStateException(
            s"legacy compaction recovery: $dir and $siblingTmp hold " +
              "overlapping but divergent rows — refusing to guess " +
              "which is authoritative; reconcile manually")
      }
    }
  }

  /** Compact one flat parquet dir. Returns the resulting data-file
    * count if a rewrite happened, None if the dir is absent or already
    * within budget (recovery still runs in that case). */
  def compactFlat(spark: SparkSession, dirPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Option[Int] = {
    SwapWrite.recover(spark, dirPath)
    migrateLegacyResidue(spark, dirPath)
    val dir = new Path(dirPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return None
    def dataFiles() = fs.listStatus(dir)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val files = dataFiles()
    if (files.isEmpty) return None
    val want = math.max(1, math.ceil(
      files.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
    if (files.length <= want) None
    else {
      // coalesce, not repartition: a file merge needs no shuffle. The
      // self-read is safe because SwapWrite materializes the rewrite
      // into the tmp before the live dir moves.
      SwapWrite.overwrite(spark, dirPath,
        spark.read.parquet(dirPath).coalesce(want))
      Some(dataFiles().length)
    }
  }
}
