package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.SwapWrite

/** The whole-directory rename-swap contract in isolation: an overwrite
  * whose plan READS the table it replaces, and recovery from every
  * residue state the protocol can leave — directly, without the ANN or
  * curation machinery on top (AnnDeleteSpec and CurationErasureSpec
  * exercise the same states end-to-end).
  */
class SwapWriteSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft-swap").toString
    val t = s"$dir/tbl"
    (0L until 100L).toDF("id").write.parquet(t)
    t
  }
  private def ids(t: String): Seq[Long] =
    spark.read.parquet(t).as[Long].collect().sorted.toSeq

  test("overwrite with a self-reading plan, repeatedly") {
    val t = freshTable()
    SwapWrite.overwrite(spark, t,
      spark.read.parquet(t).filter($"id" % 2 === 0))
    assert(ids(t) == (0L until 100L by 2))
    SwapWrite.overwrite(spark, t,
      spark.read.parquet(t).filter($"id" < 50))
    assert(ids(t) == (0L until 50L by 2))
    // residue never accumulates
    val parent = new java.io.File(t).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("tbl"))
  }

  test("recovery: every residue state resolves to the correct table") {
    // state A: crash after the tmp write, before the swap — the tmp is
    // a dead duplicate, the table wins
    val tA = freshTable()
    val dirA = new java.io.File(tA).getParentFile
    (900L until 910L).toDF("id").write
      .parquet(s"$dirA/.swap-tbl")
    SwapWrite.recover(spark, tA)
    assert(ids(tA) == (0L until 100L))
    assert(dirA.listFiles().map(_.getName).toSet == Set("tbl"))

    // state B: crash between the renames — the tmp holds the ONLY
    // complete copy; recovery must finish the swap forward
    val tB = freshTable()
    val dirB = new java.io.File(tB).getParentFile
    (0L until 100L by 2).toDF("id").write.parquet(s"$dirB/.swap-tbl")
    assert(new java.io.File(tB).renameTo(new java.io.File(s"$dirB/.swap-tbl-old")))
    SwapWrite.recover(spark, tB)
    assert(ids(tB) == (0L until 100L by 2),
      "the pending rewrite must complete, not roll back")
    assert(dirB.listFiles().map(_.getName).toSet == Set("tbl"))

    // state C: crash after the swap, before the old-dir delete — the
    // moved-aside old dir is an obsolete duplicate
    val tC = freshTable()
    val dirC = new java.io.File(tC).getParentFile
    (900L until 910L).toDF("id").write.parquet(s"$dirC/.swap-tbl-old")
    SwapWrite.recover(spark, tC)
    assert(ids(tC) == (0L until 100L))
    assert(dirC.listFiles().map(_.getName).toSet == Set("tbl"))
  }
}
