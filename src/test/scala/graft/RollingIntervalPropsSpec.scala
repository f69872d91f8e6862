package graft

import java.sql.Date
import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models.CompositeModels

/** Randomized equivalence of the two rolling-actives formulations: the
  * interval (difference-array) path must produce EXACTLY the rows of
  * the independent ×(lookback+1) explode reference on arbitrary flagged
  * grids — sparse calendars, gap patterns straddling the window width,
  * wallets with single/boundary/duplicate role-days. This is the
  * contract that lets `activeAccountsAppFromGrid` pick its formulation
  * by window width without any semantic drift.
  */
class RollingIntervalPropsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def day(i: Int): Date =
    Date.valueOf(LocalDate.parse("2024-01-01").plusDays(i.toLong))

  /** Independent reference: the explode-to-equi tail (re-implemented
    * here, not shared with the production code under test). */
  private def explodeReference(grid: DataFrame, lookback: Int): DataFrame = {
    val days = grid.select($"date_key").distinct()
      .withColumnRenamed("date_key", "anchor_date")
    grid.filter($"is_spend" || $"is_earn")
      .withColumn("anchor_date",
        explode(sequence($"date_key", date_add($"date_key", lookback))))
      .join(broadcast(days), Seq("anchor_date"), "left_semi")
      .groupBy($"anchor_date", $"app_id", $"wallet_id")
      .agg(max($"is_spend").as("w_spend"), max($"is_earn").as("w_earn"))
      .groupBy($"anchor_date", $"app_id")
      .agg(count(lit(1)).as("active_users"),
        sum(when($"w_spend", 1L).otherwise(0L)).as("active_spenders"),
        sum(when($"w_earn", 1L).otherwise(0L)).as("active_earners"))
      .select($"anchor_date".as("date_key"), $"app_id",
        $"active_users", $"active_spenders", $"active_earners")
  }

  private def randomGrid(seed: Long): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val rows = (1 to 300).map { _ =>
      (day(rnd.nextInt(60)), rnd.nextInt(5).toLong, rnd.nextInt(20).toLong,
        rnd.nextBoolean(), rnd.nextBoolean())
    }.distinct
    rows.toDF("date_key", "app_id", "wallet_id", "is_spend", "is_earn")
      // one row per (date, app, wallet), like the real grid
      .groupBy($"date_key", $"app_id", $"wallet_id")
      .agg(max($"is_spend").as("is_spend"), max($"is_earn").as("is_earn"))
  }

  test("interval path ≡ explode reference on random grids and windows") {
    for (seed <- 1L to 4L; lookback <- Seq(1, 6, 13, 29)) {
      val grid = randomGrid(seed * 31 + lookback).cache()
      val a = CompositeModels
        .rollingFromIntervals(grid, Seq("app_id"), lookback)
        .collect().map(_.toString).sorted.toSeq
      val b = explodeReference(grid, lookback)
        .collect().map(_.toString).sorted.toSeq
      assert(a == b, s"seed=$seed lookback=$lookback")
      grid.unpersist()
    }
  }

  test("the crossover conf switches the formulation with no semantic drift") {
    val grid = randomGrid(99L).cache()
    def viaConf(minLookback: Int): Seq[String] = {
      spark.conf.set(CompositeModels.IntervalMinLookbackConf,
        minLookback.toString)
      try CompositeModels.activeAccountsAppFromGrid(grid, 13)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.unset(CompositeModels.IntervalMinLookbackConf)
    }
    // lookback 13 takes the explode path at the default (14), the
    // interval path when the conf drops to 1 — identical rows either way
    assert(viaConf(Int.MaxValue) == viaConf(1))
    assert(CompositeModels.IntervalMinLookbackDefault == 14)
    grid.unpersist()
  }

  test("edge grids: single day, all-one-wallet, window wider than calendar") {
    val single = Seq((day(0), 1L, 1L, true, false))
      .toDF("date_key", "app_id", "wallet_id", "is_spend", "is_earn")
    assert(CompositeModels.rollingFromIntervals(single, Seq("app_id"), 29)
      .collect().map(_.toString).sorted.toSeq ==
      explodeReference(single, 29).collect().map(_.toString).sorted.toSeq)
    // sparse two-day wallet with the gap exactly AT the window width:
    // day 0 and day `lookback` merge; day `lookback`+1 would not
    val atWidth = Seq(
      (day(0), 1L, 1L, true, true),
      (day(29), 1L, 1L, false, true),
      (day(30), 1L, 2L, true, false))
      .toDF("date_key", "app_id", "wallet_id", "is_spend", "is_earn")
    assert(CompositeModels.rollingFromIntervals(atWidth, Seq("app_id"), 29)
      .collect().map(_.toString).sorted.toSeq ==
      explodeReference(atWidth, 29).collect().map(_.toString).sorted.toSeq)
  }
}
