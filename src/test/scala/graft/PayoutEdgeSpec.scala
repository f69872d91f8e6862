package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.KreModels

/** Edge cases of the monopoly-cap algebra (`daily_kin_payout.sql`) with
  * crafted inputs — each CASE branch exercised deterministically.
  */
class PayoutEdgeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def aubDf(rows: (String, Int, String)*): DataFrame =
    rows.toSeq.toDF("dk", "app_id", "aub")
      .select(to_date($"dk").as("date_key"), $"app_id",
        $"aub".cast("decimal(38,2)").as("capped_aub"))

  private def vfDf(days: String*): DataFrame =
    days.toSeq.toDF("dk")
      .select(to_date($"dk").as("date_key"),
        lit(BigDecimal(0)).cast("decimal(24,6)").as("volatility_factor"),
        lit(BigDecimal(1)).cast("decimal(24,6)").as("average_price"))

  private val dim = Seq((1, "app1"), (2, "app2"), (3, "app3"))
    .toDF("n_nationkey", "n_name")

  private def run(aub: DataFrame): Map[Int, (Double, Double)] =
    KreModels.dailyPayoutFrom(spark, aub, vfDf("2024-01-01"), dim)
      .select($"app_id", $"pre_monopoly_share".cast("double"),
        $"post_monopoly_share".cast("double"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap

  test("no monopoly: shares pass through unadjusted") {
    val out = run(aubDf(("2024-01-01", 1, "40"), ("2024-01-01", 2, "35"),
      ("2024-01-01", 3, "25")))
    out.foreach { case (_, (pre, post)) => assert(pre == post) }
  }

  test("s1 > 0.5 triggers the 2/3 compression and rescales the rest") {
    // shares: 0.8 / 0.15 / 0.05 → s1' = 0.5 + ((0.8-0.5)/0.5)(2/3-1/2)
    val out = run(aubDf(("2024-01-01", 1, "80"), ("2024-01-01", 2, "15"),
      ("2024-01-01", 3, "5")))
    val s1i = 0.5 + ((0.8 - 0.5) / 0.5) * (2.0 / 3.0 - 1.0 / 2.0)
    assert(math.abs(out(1)._2 - s1i) < 1e-6)
    // others rescale into (1 - s1a) proportionally to pre shares
    val expected2 = (0.15 / (1.0 - 0.8)) * (1.0 - s1i)
    assert(math.abs(out(2)._2 - expected2) < 1e-6)
    // total mass conserved-ish: sum of post shares <= 1
    assert(out.values.map(_._2).sum <= 1.0 + 1e-6)
  }

  test("exactly s1 = 0.5 does NOT trigger the cap (strict >)") {
    val out = run(aubDf(("2024-01-01", 1, "50"), ("2024-01-01", 2, "30"),
      ("2024-01-01", 3, "20")))
    assert(out(1)._1 == out(1)._2)
  }

  test("s1' + s2 > 0.9 triggers the 90% joint cap on both top shares") {
    // shares 0.55 / 0.40 / 0.05: s1' ≈ 0.5167, s1'+s2 = 0.9167 > 0.9
    val out = run(aubDf(("2024-01-01", 1, "55"), ("2024-01-01", 2, "40"),
      ("2024-01-01", 3, "5")))
    val s1 = 0.55; val s2 = 0.40
    val s1i = 0.5 + ((s1 - 0.5) / 0.5) * (2.0 / 3.0 - 1.0 / 2.0)
    val s2a = (s2 / (s1 + s2)) * 0.9
    val s1a = math.min(s1i, (s1i / (s1i + s2)) * 0.9)
    assert(math.abs(out(1)._2 - s1a) < 1e-6)
    // rank-3 rescales into the residual 10%
    assert(math.abs(out(3)._2 - (0.05 / (1.0 - s1 - s2)) * 0.1) < 1e-6)
    assert(s2a < s2) // the second share was genuinely reduced
  }

  test("a date without a rank-2 app is dropped (reference behavior)") {
    val out = KreModels.dailyPayoutFrom(spark,
      aubDf(("2024-01-01", 1, "100")), vfDf("2024-01-01"), dim)
    assert(out.count() == 0)
  }

  test("dim decoration falls back to UNKNOWN for unmapped apps") {
    val rows = KreModels.dailyPayoutFrom(spark,
      aubDf(("2024-01-01", 1, "40"), ("2024-01-01", 99, "60")),
      vfDf("2024-01-01"), dim)
      .select($"app_id", $"app_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rows(1) == "app1" && rows(99) == "UNKNOWN")
  }
}
