package graft

import java.sql.Date
import java.time.LocalDate
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RangeJoinRewrite

/** The §4-optional planner component: a naive constant-width BETWEEN
  * range join — which Spark plans as a BroadcastNestedLoopJoin — must
  * become the explode-to-equi linear plan under `RangeJoinRewrite`,
  * with identical results and surviving extra conjuncts.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def day(i: Int): Date =
    Date.valueOf(LocalDate.parse("2024-01-01").plusDays(i.toLong))

  private def price: DataFrame =
    (0 until 60).map(i => (day(i), i * 1.0)).toDF("date_key", "price")
  private def anchors: DataFrame =
    (30 until 60).map(i => Tuple1(day(i))).toDF("anchor_date")

  private def naiveRangeJoin(extra: Boolean = false): DataFrame = {
    val cond = $"date_key" >= date_sub($"anchor_date", 29) &&
      $"date_key" <= $"anchor_date"
    price.join(anchors, if (extra) cond && $"price" > 5.0 else cond)
  }

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    try body
    finally spark.experimental.extraOptimizations = Nil
  }

  test("BETWEEN join becomes explode-to-equi: no nested loop, same rows") {
    val before = naiveRangeJoin()
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = before.collect().map(_.toString).sorted.toSeq
    withRule {
      val after = naiveRangeJoin()
      val phys = after.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      assert(phys.contains("Generate"), phys)
      assert(after.collect().map(_.toString).sorted.toSeq == expected)
      // each of the 30 anchors sees exactly its 30-day window
      assert(after.count() == 30L * 30L)
    }
  }

  test("extra conjuncts survive the rewrite") {
    val expected = naiveRangeJoin(extra = true).collect()
      .map(_.toString).sorted.toSeq
    withRule {
      val after = naiveRangeJoin(extra = true)
      assert(!after.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
      assert(after.collect().map(_.toString).sorted.toSeq == expected)
    }
  }

  private def naiveShiftedJoin(): DataFrame =
    // the reference's weekly-payout window shape: d BETWEEN a-8 AND a-2
    price.join(anchors, $"date_key" >= date_sub($"anchor_date", 8) &&
      $"date_key" <= date_sub($"anchor_date", 2))

  test("shifted BETWEEN window (a-k1 .. a-k2) rewrites too") {
    val before = naiveShiftedJoin()
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = before.collect().map(_.toString).sorted.toSeq
    withRule {
      val after = naiveShiftedJoin()
      val phys = after.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      assert(phys.contains("Generate"), phys)
      assert(after.collect().map(_.toString).sorted.toSeq == expected)
      // each of the 30 anchors sees exactly its 7-day shifted window
      assert(after.count() == 30L * 7L)
    }
  }

  test("q29 weekly payout plans with no nested-loop join (rule not needed)") {
    // the hand-written model derives each payout row's unique served
    // Monday as a scalar (week(d+8)) — the last BNLJ in the repo, gone
    val plan = graft.models.KreModels
      .kreWeeklyPayout(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  // the reference's left-range shape (daily_active_user_balance_by_app
  // .sql:47-49): preserved anchors LEFT JOIN date-carrying rows. The
  // 100.. anchors sit past the price calendar, so they must survive as
  // exactly one null-extended row each.
  private def anchorsWithGap: DataFrame =
    ((30 until 60) ++ (100 until 105)).map(i => Tuple1(day(i)))
      .toDF("anchor_date")

  private def naiveLeftRangeJoin(): DataFrame =
    anchorsWithGap.join(price,
      $"date_key" >= date_sub($"anchor_date", 29) &&
        $"date_key" <= $"anchor_date",
      "left")

  test("LEFT range join rewrites when the date side is non-preserved") {
    val before = naiveLeftRangeJoin()
    assert(before.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val expected = before.collect().map(_.toString).sorted.toSeq
    withRule {
      val after = naiveLeftRangeJoin()
      val phys = after.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      assert(phys.contains("Generate"), phys)
      assert(after.collect().map(_.toString).sorted.toSeq == expected)
      // 30 matched anchors × 30-day window + 5 unmatched anchors kept
      // as exactly one null-extended row each
      assert(after.count() == 30L * 30L + 5L)
    }
  }

  test("RIGHT range join rewrites when the date side is non-preserved") {
    val naive = () => price.join(anchorsWithGap,
      $"date_key" >= date_sub($"anchor_date", 29) &&
        $"date_key" <= $"anchor_date",
      "right")
    val expected = naive().collect().map(_.toString).sorted.toSeq
    withRule {
      val after = naive()
      val phys = after.queryExecution.executedPlan.toString
      assert(!phys.contains("BroadcastNestedLoopJoin") &&
        !phys.contains("CartesianProduct"), phys)
      assert(after.collect().map(_.toString).sorted.toSeq == expected)
    }
  }

  test("outer range join with the date on the PRESERVED side stays put") {
    // exploding the preserved side would emit spurious null-extended
    // copies for partially-matched rows — the rule must not touch it
    val naive = () => price.join(anchors,
      $"date_key" >= date_sub($"anchor_date", 29) &&
        $"date_key" <= $"anchor_date",
      "left")
    val expected = naive().collect().map(_.toString).sorted.toSeq
    withRule {
      val after = naive()
      assert(!after.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(after.collect().map(_.toString).sorted.toSeq == expected)
    }
  }

  test("non-range joins and open-ended ranges are left untouched") {
    withRule {
      // plain equi join: no Generate must appear
      val equi = price.join(anchors, $"date_key" === $"anchor_date")
      assert(!equi.queryExecution.optimizedPlan.toString.contains("Generate"))
      // one-sided range (no lower bound): not rewritable, still correct
      val open = price.join(anchors, $"date_key" <= $"anchor_date")
      assert(!open.queryExecution.optimizedPlan.toString.contains("Generate"))
      assert(open.count() == (30 until 60).map(i => i + 1).sum.toLong)
    }
  }
}
