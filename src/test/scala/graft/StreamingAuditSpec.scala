package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.runner.{Cadence, ModelRegistry}
import graft.streaming.StreamingModelRunner

/** Structural guards on the streaming tier — the stream-side analog of
  * PlanAuditSpec: every twin must shadow a REGISTERED model of the
  * cadence its gate implements, and every twin's plan must carry an
  * event-time watermark (the thing that bounds state; a twin that
  * loses its `withWatermark` would grow state forever at 100 TB and
  * never emit in append mode).
  */
class StreamingAuditSpec extends AnyFunSuite {
  val spark = TestSpark.spark

  private val expectedCadence = Map(
    "daily_txn_summary" -> Cadence.Daily,
    "daily_distinct_wallets" -> Cadence.Daily,
    "weekly_txn_rollup" -> Cadence.Weekly,
    "monthly_txn_rollup" -> Cadence.Monthly,
    "daily_wallet_freq_sketches" -> Cadence.Daily,
    "daily_wallet_theta_sketches" -> Cadence.Daily,
    "daily_amount_sketches" -> Cadence.Daily)

  test("every streaming twin shadows a registered model, cadence-true") {
    // a twin may shadow a model in ANY registered DAG — the core mart
    // or an opt-in sketch tier
    val registered = (ModelRegistry.kreDag ++ ModelRegistry.sketchDag ++
      ModelRegistry.quantileDag ++ ModelRegistry.freqDag ++
      ModelRegistry.retentionDag).map(m => m.name -> m).toMap
    for ((name, _) <- StreamingModelRunner.twins) {
      val model = registered.getOrElse(name,
        fail(s"twin $name has no registered batch model"))
      assert(expectedCadence.contains(name),
        s"twin $name missing from the cadence expectation map")
      assert(model.cadence == expectedCadence(name),
        s"twin $name gate vs registry cadence")
    }
  }

  test("every twin's plan is streaming and watermarked (bounded state)") {
    val in = Files.createTempDirectory("graft-stream-audit").toString
    for ((name, mk) <- StreamingModelRunner.twins) {
      val df = mk(spark, in)
      assert(df.isStreaming, s"$name must be a streaming plan")
      val plan = df.queryExecution.analyzed.toString
      assert(plan.contains("EventTimeWatermark"),
        s"$name lost its withWatermark — state would be unbounded")
      assert(plan.contains("DeduplicateWithinWatermark"),
        s"$name lost the event_id dedupe prologue")
    }
  }
}
