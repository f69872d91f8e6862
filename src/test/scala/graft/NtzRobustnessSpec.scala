package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType
import org.scalatest.funsuite.AnyFunSuite

/** Repo-wide encoding invariant: every published query must ANALYZE
  * identically whatever physical encoding `events.ts` arrives in —
  * the round-6 testdata regeneration flipped nanos-long to micros-NTZ
  * and broke q44 at analysis time, so this pins the whole surface, not
  * just the one query. Analysis-only (no execution): the NTZ break was
  * an analysis error (`unix_micros` rejects TIMESTAMP_NTZ), so building
  * the analyzed plan over each staged encoding is the exact regression
  * gate at plan-build cost.
  */
class NtzRobustnessSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Stage a full table dir: symlink every table, rewrite events with
    * `reEncode` applied to its (already-normalized) frame. */
  private def stage(name: String)(
      reEncode: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): String = {
    val base = Files.createTempDirectory(s"graft-enc-$name")
    Files.list(Paths.get(sfDir)).forEach { p: Path =>
      if (p.getFileName.toString != "events.parquet")
        Files.createSymbolicLink(base.resolve(p.getFileName), p)
    }
    reEncode(graft.catalog.Tables.events(spark, sfDir))
      .write.parquet(s"$base/events.parquet")
    base.toString
  }

  test("TPC-H timestamp columns tolerate both LTZ and NTZ flavors") {
    // lineitem.l_shipdate / orders.o_orderdate are NTZ in the current
    // testdata; the driver has flipped physical encodings before
    // (events, round 6), so pin that every query still analyzes when
    // these arrive as LTZ micros instead (and vice versa). Semantics
    // are unchanged under the pinned UTC session zone — analysis is
    // the regression gate.
    def restage(name: String, flip: Map[String, String]): String = {
      val base = Files.createTempDirectory(s"graft-tpch-$name")
      Files.list(Paths.get(sfDir)).forEach { p: Path =>
        if (!flip.contains(p.getFileName.toString))
          Files.createSymbolicLink(base.resolve(p.getFileName), p)
      }
      flip.foreach { case (file, tsCol) =>
        spark.read.parquet(s"$sfDir/$file")
          .withColumn(tsCol, col(tsCol).cast("timestamp"))
          .write.parquet(s"$base/$file")
      }
      base.toString
    }
    val ltzDir = restage("ltz", Map(
      "lineitem.parquet" -> "l_shipdate", "orders.parquet" -> "o_orderdate"))
    val failures = for {
      (qname, fn) <- SparkEntry.rawQueries.toSeq.sortBy(_._1)
      err <- (try { fn(spark, ltzDir).queryExecution.analyzed; None }
              catch { case e: Throwable =>
                Some(s"$qname over ltz tpch: ${e.getMessage.linesIterator.next()}") })
    } yield err
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("all published queries analyze over every events.ts encoding") {
    val dirs = Map(
      // nanos surfaced as LongType (TIMESTAMP(NANOS) under nanosAsLong)
      "nanos" -> stage("nanos")(df =>
        df.withColumn("ts", unix_micros($"ts") * 1000)),
      "ltz" -> stage("ltz")(identity),
      "ntz" -> stage("ntz")(df =>
        df.withColumn("ts", $"ts".cast(TimestampNTZType))))
    val failures = for {
      (enc, dir) <- dirs.toSeq
      (qname, fn) <- SparkEntry.rawQueries.toSeq.sortBy(_._1)
      err <- (try { fn(spark, dir).queryExecution.analyzed; None }
              catch { case e: Throwable =>
                Some(s"$qname over $enc: ${e.getMessage.linesIterator.next()}") })
    } yield err
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
