package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingDedup

/** Streaming dedup: an input with injected same-id duplicates must come
  * out with exactly the batch `dropDuplicates("event_id")` row set.
  */
class StreamingDedupSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("availableNow dedup stream emits one row per event_id") {
    val base = Files.createTempDirectory("graft-sdedup").toString
    val in = s"$base/in"; val out = s"$base/out"; val ck = s"$base/ck"
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
      .filter($"event_type" =!= "error").limit(500).cache()
    // duplicates WITHIN the watermark horizon (same rows again)
    ev.union(ev.limit(200)).write.parquet(in)
    val q = StreamingDedup.runAvailableNow(spark, in, ck, out)
    q.awaitTermination()
    val got = spark.read.parquet(out)
    assert(got.count() == got.select($"event_id").distinct().count())
    // every original id survives exactly once
    assert(got.select($"event_id").distinct().count() ==
      ev.select($"event_id").distinct().count())
  }
}
