package graft

import java.time.LocalDate
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.ZOrderKey
import graft.runner.{Cadence, IncrementalRunner, ModelDef}

/** The Morton-key expression and its clusterBy integration: bit-exact
  * interleave, the quadrant property that MAKES it a locality key, the
  * codegen'd SQL surface, and a runner write whose files are physically
  * z-ordered.
  */
class ZOrderSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("interleave is bit-exact against a per-bit reference") {
    val rnd = new scala.util.Random(42)
    def reference(a: Long, b: Long): Long = {
      var out = 0L
      for (i <- 0 until 31) {
        out |= ((a >> i) & 1L) << (2 * i)
        out |= ((b >> i) & 1L) << (2 * i + 1)
      }
      out
    }
    for (_ <- 1 to 2000) {
      val a = rnd.nextLong().abs % (1L << 31)
      val b = rnd.nextLong().abs % (1L << 31)
      assert(ZOrderKey.interleave(a, b) === reference(a, b), s"($a, $b)")
    }
    // masking: bits ≥ 31 and sign bits do not leak into the key
    assert(ZOrderKey.interleave(-1L, -1L) ===
      ZOrderKey.interleave((1L << 31) - 1, (1L << 31) - 1))
    assert(ZOrderKey.interleave(1L << 31, 0L) === 0L)
  }

  test("z-order sorts a 16x16 grid quadrant-first (the locality property)") {
    val cells = for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong)
    val sorted = cells.sortBy { case (a, b) => ZOrderKey.interleave(a, b) }
    // the first quarter of the curve is EXACTLY the (a<8, b<8) quadrant:
    // a range predicate on either key skips whole contiguous runs
    assert(sorted.take(64).toSet === cells.filter(c => c._1 < 8 && c._2 < 8).toSet)
    // keys are unique over the grid (the curve is a bijection)
    assert(sorted.map { case (a, b) => ZOrderKey.interleave(a, b) }.distinct.size === 256)
  }

  test("SQL surface zorder_key executes under codegen with implicit int casts") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq((3, 5L), (7, 2L), (0, 0L)).toDF("a", "b")
      .select(call_function("zorder_key", $"a", $"b").as("z"))
    assert(df.schema("z").dataType.typeName === "long")
    assert(df.as[Long].collect().toSeq ===
      Seq(ZOrderKey.interleave(3, 5), ZOrderKey.interleave(7, 2), 0L))
    // null propagates
    val withNull = Seq[(java.lang.Long, java.lang.Long)]((1L, null))
      .toDF("a", "b")
      .select(call_function("zorder_key", $"a", $"b").as("z"))
    assert(withNull.collect().head.isNullAt(0))
  }

  test("clusterBy accepts the zorder expression; written files are curve-ordered") {
    val wh = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val r = new IncrementalRunner(spark, wh, LocalDate.parse("2024-01-03"))
    val src = (for (a <- 0L until 16L; b <- 0L until 16L)
      yield ("2024-01-01", a, b)).toDF("dk", "ka", "kb")
      .select(to_date($"dk").as("date_key"), $"ka", $"kb")
    val m = ModelDef("zclustered", Cadence.Daily, Seq("src"),
      (_, resolve) => resolve("src"),
      clusterBy = Seq("zorder_key(ka, kb)"))
    assert(r.runIncremental(m, _ => src) == 256)
    val files = new java.io.File(r.targetPath("zclustered")).listFiles()
      .filter(_.getName.startsWith("date_key="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    for (f <- files) {
      val keys = spark.read.parquet(f.getAbsolutePath)
        .select($"ka", $"kb").as[(Long, Long)].collect()
        .map { case (a, b) => ZOrderKey.interleave(a, b) }.toSeq
      assert(keys == keys.sorted, s"${f.getName} not curve-ordered")
    }
  }
}
