package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Loader contract: `Tables.events` must normalize every physical `ts`
  * encoding the upstream writer can produce to the SAME TimestampType
  * microsecond values — the reference consumes raw ingestion tables it
  * doesn't control, so encoding drift (nanos-long vs micros-LTZ vs
  * micros-NTZ, the round-6 testdata regeneration) must be invisible to
  * every downstream model.
  */
class EventLoaderSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  // canonical event times in epoch micros; -2 exercises the pre-1970
  // floor-vs-truncate correction in the nanos branch
  private val micros = Seq(-2L, 0L, 1L, 1723500000123456L)

  private def write(dir: String)(ts: Long => org.apache.spark.sql.Column): Unit =
    micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us, i.toLong, "view", 1.0, "{}") }
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", ts(0L)).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

  test("nanos-long, micros-LTZ and micros-NTZ encodings normalize identically") {
    val base = Files.createTempDirectory("graft-evload").toString
    // 1) nanos surfaced as LongType — how parquet TIMESTAMP(NANOS) reads
    //    under nanosAsLong=true; +789ns remainder exercises the floor
    write(s"$base/nanos")(_ => $"us" * 1000 + 789)
    // 2) micros as TimestampType (UTC-adjusted micros on disk)
    write(s"$base/ltz")(_ => timestamp_micros($"us"))
    // 3) micros as TIMESTAMP_NTZ (isAdjustedToUTC=false on disk — the
    //    regenerated-testdata encoding)
    write(s"$base/ntz")(_ => timestamp_micros($"us").cast(TimestampNTZType))

    val got = Seq("nanos", "ltz", "ntz").map { enc =>
      val df = graft.catalog.Tables.events(spark, s"$base/$enc")
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc must surface ts as TimestampType")
      enc -> df.select($"event_id", unix_micros($"ts"))
        .as[(Long, Long)].collect().sortBy(_._1).toSeq
    }.toMap
    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    got.foreach { case (enc, vals) =>
      assert(vals == expected, s"$enc mismatched the canonical micros")
    }
  }
}
