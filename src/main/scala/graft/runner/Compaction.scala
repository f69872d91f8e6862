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

  /** Compact one flat parquet dir. Returns the resulting data-file
    * count if a rewrite happened, None if the dir is absent or already
    * within budget (recovery still runs in that case). */
  def compactFlat(spark: SparkSession, dirPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Option[Int] = {
    SwapWrite.recover(spark, dirPath)
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
