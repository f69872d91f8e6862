package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.MultimodalOps

/** The multimodal plumbing: typed Dataset → mapPartitions decode path
  * must agree with the SQL-expressible md5 formulation used by the
  * oracle-checked m01 query.
  */
class MultimodalSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("mapPartitions decode path matches the SQL fake-decode exactly") {
    val sfDir = "/root/testdata/sf0.001"
    val viaDs = MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sfDir))
      .groupBy($"format")
      .agg(count(lit(1)).as("media_count"),
        sum($"byte_len".cast("long")).as("total_bytes"),
        sum($"width".cast("long")).as("width_sum"),
        sum($"height".cast("long")).as("height_sum"),
        sum($"channels".cast("long")).as("channel_sum"))
    val viaSql = MultimodalOps.mediaMetaSummary(spark, sfDir)
    val a = viaDs.orderBy($"format").collect().map(_.toSeq).toSeq
    val b = viaSql.orderBy($"format").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("typed resize plan matches the SQL replay (m03)") {
    val sfDir = "/root/testdata/sf0.001"
    val viaDs = MultimodalOps.resizePlan(MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sfDir)))
      .groupBy($"format")
      .agg(count(lit(1)).as("media_count"),
        sum($"out_w".cast("long")).as("out_width_sum"),
        sum($"out_h".cast("long")).as("out_height_sum"),
        sum($"thumb_bytes").as("thumb_bytes"))
    val viaSql = MultimodalOps.resizeSummary(spark, sfDir)
      .drop("landscape_count")
    val a = viaDs.orderBy($"format").collect().map(_.toSeq).toSeq
    val b = viaSql.orderBy($"format").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // the fit is aspect-preserving into a 224 box: long side maps to 224
    val plans = MultimodalOps.resizePlan(MultimodalOps.decodeFeatures(
      MultimodalOps.mediaTable(spark, sfDir))).collect()
    assert(plans.forall(p => math.max(p.out_w, p.out_h) == 224))
  }

  test("decoder stub is deterministic and dimension-bounded") {
    val (w1, h1, c1) = MultimodalOps.fakeDecode("abc".getBytes("UTF-8"))
    val (w2, h2, c2) = MultimodalOps.fakeDecode("abc".getBytes("UTF-8"))
    assert((w1, h1, c1) == (w2, h2, c2))
    assert(w1 >= 64 && w1 <= 64 + 255 * 8 && (c1 == 1 || c1 == 3))
  }
}
