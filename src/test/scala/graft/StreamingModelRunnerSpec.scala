package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.catalog.Tables
import graft.runner.{IncrementalRunner, ModelRegistry}
import graft.streaming.StreamingModelRunner

/** Streaming twins of registered models: a two-phase catch-up over
  * event files must equal the batch incremental runner's materialized
  * table after each phase — same rows, same decimals — with the second
  * catch-up appending ONLY the newly closed days (the checkpointed
  * watermark playing the runner's high-watermark role).
  */
class StreamingModelRunnerSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val evCols =
    Seq("event_id", "ts", "user_id", "event_type", "value", "props")

  /** A far-future heartbeat row: error-typed (never aggregated), it only
    * drags the event-time watermark past `d + plusDays`. */
  private def sentinel(d: Date, plusDays: Int, id: Long): DataFrame =
    Seq((id, Timestamp.valueOf(
      d.toLocalDate.plusDays(plusDays.toLong).atStartOfDay),
      0L, "error", 0.0, "{}"))
      .toDF(evCols: _*)

  /** Runs the shared two-phase protocol for one twin and asserts
    * stream ≡ batch after each phase plus append-only growth between
    * them. `normalize` projects the model's output columns to stable
    * strings (decimals cast via string so scale mismatches surface).
    * `events` defaults to the sf0.001 fixture; cadences needing a
    * longer calendar (monthly) pass a synthetic frame.
    */
  private def twoPhase(model: String, events: Option[DataFrame] = None)(
      normalize: DataFrame => Seq[String]): Unit = {
    val base = Files.createTempDirectory(s"graft-smr-$model").toString
    val in = s"$base/in"; val ck = s"$base/ck"; val out = s"$base/out"
    val wh = s"$base/wh"
    val ev = events.getOrElse(
      Tables.events(spark, "/root/testdata/sf0.001"))
      .select(evCols.map(col): _*)
    val days = ev.select(to_date($"ts").as("d")).distinct()
      .orderBy($"d").as[Date].collect()
    assert(days.length >= 4, "fixture needs a multi-day calendar")
    val splitDay = days(days.length / 2)
    val lastDay = days.last

    val models = ModelRegistry.kreDag
      .filter(m => Set("fact_txn", model)(m.name))
    assert(models.exists(_.name == model), s"$model must be registered")
    val sources: String => DataFrame = {
      case "events" => spark.read.parquet(in)
      case other => fail(s"unexpected source $other")
    }

    // --- phase 1: half the calendar + a watermark sentinel two days out,
    // so every day ≤ splitDay closes for BOTH engines
    ev.filter(to_date($"ts") <= lit(splitDay))
      .coalesce(1).write.mode("append").parquet(in)
    sentinel(splitDay, 2, -1L).coalesce(1).write.mode("append").parquet(in)
    StreamingModelRunner.catchUp(spark, model, in, ck, out)
      .awaitTermination()
    new IncrementalRunner(spark, wh, splitDay.toLocalDate.plusDays(1))
      .runAll(models, sources)
    val streamed1 = normalize(spark.read.parquet(out))
    val batch1 = normalize(spark.read.parquet(s"$wh/$model"))
    assert(streamed1 == batch1)
    assert(streamed1.nonEmpty)

    // --- phase 2: the remaining days land (+N-day catch-up)
    ev.filter(to_date($"ts") > lit(splitDay))
      .coalesce(1).write.mode("append").parquet(in)
    sentinel(lastDay, 2, -2L).coalesce(1).write.mode("append").parquet(in)
    StreamingModelRunner.catchUp(spark, model, in, ck, out)
      .awaitTermination()
    new IncrementalRunner(spark, wh, lastDay.toLocalDate.plusDays(1))
      .runAll(models, sources)
    val streamed2 = normalize(spark.read.parquet(out))
    val batch2 = normalize(spark.read.parquet(s"$wh/$model"))
    assert(streamed2 == batch2)
    // append-only: the catch-up added the new days and rewrote nothing
    assert(streamed2.size > streamed1.size)
    assert(streamed1.toSet.subsetOf(streamed2.toSet))
  }

  test("streamed catch-up over +N days equals the batch runner's table") {
    twoPhase("daily_txn_summary") { df =>
      df.select(
        $"date_key".cast("string"), $"txn_type", $"txn_count",
        $"total_amount".cast("string"), $"median_amount".cast("string"),
        $"total_fees".cast("string"), $"avg_amount".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq
    }
  }

  test("streamed distinct-wallet counts equal the batch countDistinct " +
      "(chained windowed aggregation)") {
    twoPhase("daily_distinct_wallets") { df =>
      df.select($"date_key".cast("string"), $"active_wallets",
        $"txn_count")
        .collect().map(_.mkString("|")).sorted.toSeq
    }
  }

  test("weekly cadence streams under the same protocol (Monday-aligned " +
      "windows ≡ date_trunc('week') + complete-week gate)") {
    twoPhase("weekly_txn_rollup") { df =>
      df.select($"date_key".cast("string"), $"txn_type", $"txn_count",
        $"total_amount".cast("string"), $"avg_amount".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq
    }
  }

  test("monthly cadence streams via calendar-aware custom state " +
      "(flatMapGroupsWithState + month-end event-time timeout)") {
    // the fixture spans ~1 month; a monthly gate needs a longer calendar
    val synth = (1 to 1200).map { i =>
      val ts = Timestamp.valueOf(java.time.LocalDate.parse("2024-01-05")
        .plusDays((i % 85).toLong).atStartOfDay
        .plusSeconds((i * 13 % 86400).toLong))
      val tpe = (i % 4) match {
        case 0 => "purchase"; case 1 => "earn"
        case 2 => "create"; case _ => "spend"
      }
      (i.toLong, ts, (i % 50).toLong, tpe, (i % 997) / 7.0, "{}")
    } ++ Seq(
      // an exact duplicate of event 7 and an error row: the twin's
      // dedupe + status-filter prologue must drop both, like batch
      (7L, Timestamp.valueOf("2024-01-12 00:01:31"), 7L, "spend",
        1.0, "{}"),
      (-9L, Timestamp.valueOf("2024-02-02 12:00:00"), 0L, "error",
        1e9, "{}"))
    twoPhase("monthly_txn_rollup",
      Some(synth.toDF(evCols: _*))) { df =>
      df.select($"date_key".cast("string"), $"txn_type", $"txn_count",
        $"total_amount".cast("string"), $"avg_amount".cast("string"))
        .collect().map(_.mkString("|")).sorted.toSeq
    }
  }

  test("streamed replication lands closed days in a JDBC serving store " +
      "idempotently") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val base = Files.createTempDirectory("graft-smr-serve").toString
    val in = s"$base/in"
    val store = new graft.sinks.JdbcServingStore(spark,
      "jdbc:derby:memory:smrserve;create=true",
      Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver"))
    def sink: DataFrame = spark.read.format("jdbc")
      .option("url", "jdbc:derby:memory:smrserve;create=true")
      .option("dbtable", "dailyTxnSummary")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()

    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select(evCols.map(col): _*)
    val days = ev.select(to_date($"ts").as("d")).distinct()
      .orderBy($"d").as[Date].collect()
    val splitDay = days(days.length / 2)

    // phase 1: half the calendar closes and lands in Derby, camelized
    ev.filter(to_date($"ts") <= lit(splitDay))
      .coalesce(1).write.mode("append").parquet(in)
    sentinel(splitDay, 2, -1L).coalesce(1).write.mode("append").parquet(in)
    StreamingModelRunner.serveCatchUp(spark, "daily_txn_summary", in,
      s"$base/ck1", store, "dailyTxnSummary").awaitTermination()
    val served1 = sink.collect().map(_.mkString("|")).sorted.toSeq
    assert(served1.nonEmpty)
    assert(sink.columns.contains("dateKey") &&
      sink.columns.contains("txnType"))
    assert(store.watermark("dailyTxnSummary", "dateKey")
      .contains(splitDay.toString))

    // phase 2: the rest of the calendar appends only the new days
    ev.filter(to_date($"ts") > lit(splitDay))
      .coalesce(1).write.mode("append").parquet(in)
    sentinel(days.last, 2, -2L).coalesce(1).write.mode("append").parquet(in)
    StreamingModelRunner.serveCatchUp(spark, "daily_txn_summary", in,
      s"$base/ck1", store, "dailyTxnSummary").awaitTermination()
    val served2 = sink.collect().map(_.mkString("|")).sorted.toSeq
    assert(served2.size > served1.size)
    assert(served1.toSet.subsetOf(served2.toSet))

    // replay from scratch (fresh checkpoint = every micro-batch re-fires):
    // the sink-side watermark drops every already-served day
    StreamingModelRunner.serveCatchUp(spark, "daily_txn_summary", in,
      s"$base/ck2", store, "dailyTxnSummary").awaitTermination()
    assert(sink.collect().map(_.mkString("|")).sorted.toSeq == served2)

    // repair recovery, streaming edition: delete the served tail (as
    // after a mid-append crash left a day partial), then ANOTHER
    // fresh-checkpoint replay — the receded sink watermark admits
    // exactly the repaired days back and the table converges
    val rep = new graft.sinks.Replicator(spark, store)
    assert(rep.repair("dailyTxnSummary", splitDay.toLocalDate))
    assert(sink.count() < served2.size)
    StreamingModelRunner.serveCatchUp(spark, "daily_txn_summary", in,
      s"$base/ck3", store, "dailyTxnSummary").awaitTermination()
    assert(sink.collect().map(_.mkString("|")).sorted.toSeq == served2)
  }
}
