package graft.runner

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-file compaction for FLAT parquet append dirs (data files
  * directly inside the dir — no partition subdirs), the shape every
  * CurationPipeline table has: each incremental catch-up appends a
  * task-count of small part files, so after N appends a
  * `curation_span_grams` or `span_trimmed_corpus` reader opens
  * O(N·tasks) files for megabytes of data. At warehouse scale that is
  * a NameNode/listing bottleneck and a reader-task explosion —
  * compaction folds each dir back to ~`targetFileBytes`-sized files.
  *
  * Same crash contract as `IncrementalRunner.compact`'s partitioned
  * variant (the dot-tmp/swap machinery, extended here to flat dirs per
  * the round-11 review): the rewrite lands in a dot-prefixed
  * (reader-invisible) `.compact-flat` tmp dir first; the old files are
  * deleted only after the rewrite is fully on disk; the move in is
  * file-by-file renames. A killed sweep leaves one of two states,
  * distinguished by whether the dir still holds data files:
  * (a) crash before the delete → the tmp is a dead duplicate, drop it;
  * (b) crash after the delete → the tmp holds the ONLY copy, finish
  * the move. [[compactFlat]] recovers both branches on entry
  * (CurationPipelineSpec pins them).
  *
  * Single-writer contract like every mutation in the runner: the swap
  * is crash-recoverable, not atomic for concurrent readers.
  */
object Compaction {

  /** Compact one flat parquet dir. Returns the resulting data-file
    * count if a rewrite happened, None if the dir is absent or already
    * within budget (recovery still runs in that case). */
  def compactFlat(spark: SparkSession, dirPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Option[Int] = {
    val dir = new java.io.File(dirPath)
    if (!dir.exists()) return None
    val tmp = new java.io.File(dir, ".compact-flat")
    def dataFilesIn(d: java.io.File): Array[java.io.File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // recover crash residue first (see class scaladoc)
    if (tmp.isDirectory) {
      if (dataFilesIn(dir).isEmpty && dataFilesIn(tmp).nonEmpty)
        moveDataFiles(tmp, dir): Unit
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .foreach(f => f.delete(): Unit)
      tmp.delete(): Unit
    }
    val dataFiles = dataFilesIn(dir)
    if (dataFiles.isEmpty) return None
    val want = math.max(1, math.ceil(
      dataFiles.map(_.length).sum.toDouble / targetFileBytes).toInt)
    if (dataFiles.length <= want) None
    else {
      // coalesce, not repartition: a file merge needs no shuffle. The
      // dot-prefixed tmp is invisible to the reader below (Spark skips
      // dot-dirs), so the read sees exactly the current data files.
      val df = spark.read.parquet(dirPath)
      df.coalesce(want).write.mode(SaveMode.Overwrite)
        .parquet(tmp.getAbsolutePath)
      dataFiles.foreach { f =>
        val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
        if (crc.exists()) crc.delete(): Unit
        f.delete(): Unit
      }
      val moved = moveDataFiles(tmp, dir)
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .foreach(f => f.delete(): Unit)
      tmp.delete(): Unit
      Some(moved)
    }
  }

  /** Move every parquet data file (and its checksum sibling) from `src`
    * into `dest`; returns the count. Writer-generated names carry task
    * UUIDs, so moves never clash with surviving files. */
  private def moveDataFiles(src: java.io.File, dest: java.io.File): Int = {
    if (!dest.exists()) dest.mkdirs(): Unit
    val files = Option(src.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    files.foreach { f =>
      require(f.renameTo(new java.io.File(dest, f.getName)),
        s"compact: could not move $f into $dest")
      val crc = new java.io.File(src, s".${f.getName}.crc")
      if (crc.exists())
        crc.renameTo(new java.io.File(dest, crc.getName)): Unit
    }
    files.length
  }
}
