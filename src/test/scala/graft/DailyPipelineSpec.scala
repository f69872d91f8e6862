package graft

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.runner._

/** End-to-end daily pipeline (`sf_daily_pipeline.yaml:5-17` analog):
  * seed → full model DAG (incl. clones) → serving replication, in one
  * `DailyPipeline.run`. Uses sf0.001 so the whole DAG builds in test
  * time; KRE-rule models are legitimately sparse there, but every
  * stage must still materialize and the run must be idempotent.
  */
class DailyPipelineSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"
  private def sources: String => DataFrame = {
    case "events" => graft.catalog.Tables.events(spark, sfDir)
    case other => graft.catalog.Tables.load(spark, sfDir, other)
  }

  private val appJson =
    """[{"id": 1, "name": "Kik", "status": "Active",
      |  "public_wallet": "w1", "created_date": "2021-01-05",
      |  "updated_date": "2021-06-01"}]""".stripMargin
  private def series(v: Double) = Seq(
    (1700000000000L, v), (1700086400000L, v * 2), (1700172800000L, v * 3))
    .toDF("ts", "value")

  test("seed → models → replicate composes end-to-end and is idempotent") {
    val wh = Files.createTempDirectory("graft-pipe-wh").toString
    val serving = Files.createTempDirectory("graft-pipe-serve").toString
    val p = new DailyPipeline(spark, wh, serving, LocalDate.parse("2024-02-05"))
    val r1 = p.run(sources, Some(appJson),
      Some((series(1.0), series(10.0), series(100.0))))
    // stage 1: both dims materialized and readable
    assert(p.runner.readModel("dim_app").count() == 1)
    assert(p.runner.readModel("dim_price").count() == 2)
    // stage 2: full DAG materialized; clones resolvable
    assert(r1.modelRows("fact_txn") > 0)
    for (m <- ModelRegistry.kreDag) assert(p.runner.exists(m.name), m.name)
    assert(spark.table("ds_daily_kin_transactions").count() ==
      p.runner.readModel("daily_txn_summary").count())
    // stage 3: all seven serving tables written with their serving-side
    // watermark column present (camelCase default, `date` where the
    // reference's rename list says so)
    assert(DailyPipeline.ServingTables.size == 7)
    for (spec <- DailyPipeline.ServingTables) {
      val sink = spark.read.parquet(p.replicator.sinkPath(spec.table))
      assert(sink.columns.contains(spec.watermarkCol), spec.table)
      assert(sink.count() == p.runner.readModel(spec.model).count(), spec.table)
    }
    assert(r1.servedRows("dailySummaryApp") > 0)
    // the per-app API sink carries the reference's exact rename list
    // (dailySummaryApp.sql:1-29) …
    val appSink = spark.read.parquet(
      p.replicator.sinkPath("dailySummaryApp"))
    for (c <- Seq("date", "index", "name", "transactionFees",
        "transactionFeesUsd", "totalDailyTransactions", "totalDailyAmount",
        "totalDailyAmountUsd", "dailyEarnTransactions", "dailyActiveUsers",
        "monthlyActiveUsers"))
      assert(appSink.columns.contains(c), s"dailySummaryApp missing $c")
    // … and the weekly payout sink the krePayoutSummary.sql renames
    val kreSink = spark.read.parquet(
      p.replicator.sinkPath("krePayoutSummary"))
    assert(kreSink.columns.sorted.toSeq == Seq("date", "kin", "top10", "usd"))
    assert(p.replicator.sinkWatermark("krePayoutSummary", "date").nonEmpty ==
      (kreSink.count() > 0))
    // idempotence: a second run with no new data appends nothing anywhere
    val r2 = p.run(sources, Some(appJson),
      Some((series(1.0), series(10.0), series(100.0))))
    val appended = r2.modelRows.filter { case (name, n) =>
      n > 0 && !ModelRegistry.kreDag.find(_.name == name).exists(_.fullRefresh)
    }
    assert(appended.isEmpty, s"non-idempotent models: $appended")
    assert(r2.servedRows.values.forall(_ == 0), r2.servedRows.toString)
  }
}
