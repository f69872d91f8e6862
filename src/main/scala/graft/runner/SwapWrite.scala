package graft.runner

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Overwrite a parquet table IN PLACE with a plan that may read from
  * that same table — the rewrite every tombstone/repair path needs
  * (`SaveMode.Overwrite` alone would delete the input out from under
  * its own scan). The swap is two whole-directory renames through the
  * Hadoop `FileSystem`, so the contract holds on whatever filesystem
  * the warehouse lives on:
  *
  *   1. write the new rows to a dot-prefixed (reader-invisible)
  *      `.swap-<name>` sibling;
  *   2. rename the table dir aside to `.swap-<name>-old`;
  *   3. rename the tmp into place;
  *   4. drop the old dir.
  *
  * The old directory is MOVED, never deleted, until the new one is in
  * place, so no crash point loses committed rows: before step 2 the
  * table is intact and the tmp is a dead duplicate; between 2 and 3
  * the tmp holds the only complete copy and recovery finishes the
  * swap forward; after 3 the old dir is an obsolete duplicate.
  * [[recover]] resolves every residue state from which of the three
  * dirs exist — callers run it on entry before trusting the table.
  *
  * Single-writer contract (the [[Compaction]] posture): the swap is
  * crash-RECOVERABLE, not atomic for concurrent readers — a reader
  * racing the rename gap can fail and must retry.
  */
object SwapWrite {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tmpPaths(table: Path): (Path, Path) = {
    val parent = table.getParent
    (new Path(parent, s".swap-${table.getName}"),
      new Path(parent, s".swap-${table.getName}-old"))
  }

  /** Resolve crash residue for `tablePath` (idempotent, cheap when
    * there is none). */
  def recover(spark: SparkSession, tablePath: String): Unit = {
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    val (tmpNew, tmpOld) = tmpPaths(table)
    if (fs.exists(tmpNew)) {
      if (fs.exists(table)) fs.delete(tmpNew, true): Unit // pre-swap dup
      else require(fs.rename(tmpNew, table), // mid-swap: only live copy
        s"SwapWrite recovery: could not rename $tmpNew to $table")
    } else if (fs.exists(tmpOld) && !fs.exists(table)) {
      // defensive (unreachable under the protocol): restore the old dir
      require(fs.rename(tmpOld, table),
        s"SwapWrite recovery: could not restore $table from $tmpOld")
    }
    if (fs.exists(tmpOld) && fs.exists(table))
      fs.delete(tmpOld, true): Unit // post-swap: obsolete duplicate
  }

  /** Replace the table at `tablePath` with `df` (which may scan
    * `tablePath` itself). Runs [[recover]] first. */
  def overwrite(spark: SparkSession, tablePath: String, df: DataFrame)
      : Unit = {
    recover(spark, tablePath)
    val table = new Path(tablePath)
    val fs = fsOf(spark, table)
    val (tmpNew, tmpOld) = tmpPaths(table)
    df.write.mode(SaveMode.Overwrite).parquet(tmpNew.toString)
    // the swap: from here a crash recovers FORWARD from the tmp
    require(fs.rename(table, tmpOld),
      s"SwapWrite: could not move $table aside to $tmpOld")
    require(fs.rename(tmpNew, table),
      s"SwapWrite: could not move $tmpNew into place at $table")
    fs.delete(tmpOld, true): Unit
  }
}
