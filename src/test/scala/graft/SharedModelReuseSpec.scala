package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.models._

/** Round-15 optimization pins: the shared-materialization pass changed
  * operator INTERNALS (injected monthly-actives legs, the s08/s09
  * shared pair stream, q20's folded orders legs) — this spec pins each
  * rewrite row-identical to the formulation it replaced, independent
  * of the DuckDB oracle gate (which pins values, not the equivalence
  * argument).
  */
class SharedModelReuseSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[String] =
    df.select(df.columns.sorted.map(c => col(c).cast("string")): _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("q40: injecting the materialized q34 rows equals deriving the monthly leg from the grid") {
    val fact = TxnModels.factTxn(spark, sfDir)
    val grid = CompositeModels.appActivityGrid(spark, sfDir)
    val vf = KreModels.volatilityFactor(spark, sfDir)
    val dim = graft.catalog.Tables.nation(spark, sfDir)
    val derived = EcosystemModels.dailySummaryByAppFrom(fact, grid, vf, dim)
    val injected = EcosystemModels.dailySummaryByAppFrom(fact, grid, vf, dim,
      monthlyIn = Some(CompositeModels.monthlyActiveAccountsShared(spark, sfDir)))
    assert(rows(injected) == rows(derived))
  }

  test("q39/q35: the eco_active_monthly memo equals the grid-derived 30-day leg for both consumers") {
    val fact = TxnModels.factTxn(spark, sfDir)
    val grid = CompositeModels.appActivityGrid(spark, sfDir)
    val vf = KreModels.volatilityFactor(spark, sfDir)
    val memo = EcosystemModels.ecoActiveMonthly(spark, sfDir)
    assert(rows(memo) ==
      rows(EcosystemModels.activeEcosystemFromGrid(grid, 29)))
    val derived = EcosystemModels.dailySummaryEcosystemFrom(fact, grid, vf)
    val injected = EcosystemModels.dailySummaryEcosystemFrom(fact, grid, vf,
      monthlyIn = Some(memo))
    assert(rows(injected) == rows(derived))
    val aub = KreModels.activeUserBalance(spark, sfDir)
    val payout = KreModels.dailyPayout(spark, sfDir)
    val kreDerived = CompositeModels.dailyKreSummaryFrom(
      fact, grid, aub, vf, payout)
    val kreInjected = CompositeModels.dailyKreSummaryFrom(
      fact, grid, aub, vf, payout, monthlyIn = Some(memo))
    assert(rows(kreInjected) == rows(kreDerived))
  }

  test("s08/s09: the shared cell_pair_sims stream reproduces the direct cell self-join") {
    // the direct formulation the memo replaced: assignment self-join
    // on the cell, self-pairs excluded, rounded cosine
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.catalog.Tables.embeddings(spark, sfDir)
    val base = SimilarityModels.doubledEmb(emb)
    val cents = Shared.materialized("ivf_cents", spark, sfDir) {
      SimilarityModels.coarseCodebook(base)
    }
    val top2 = Shared.materialized("ivf_top2", spark, sfDir) {
      SimilarityModels.cellTop2(base, cents)
    }
    val assigned = top2.filter($"crk" === 1)
      .join(emb.select($"vec_id", $"label"), Seq("vec_id"))
      .select($"vec_id", $"v", $"norm", $"cid".as("cell"), $"label")
    val a = assigned.select($"vec_id".as("anchor_id"), $"v".as("a_v"),
      $"norm".as("a_norm"), $"cell", $"label".as("anchor_label"))
    val o = assigned.select($"vec_id".as("other_id"), $"v".as("o_v"),
      $"norm".as("o_norm"), $"cell", $"label".as("other_label"))
    val direct = a.join(o, Seq("cell"))
      .filter($"anchor_id" =!= $"other_id")
      .withColumn("sim", round(
        call_function("double_dot", $"a_v", $"o_v") /
          ($"a_norm" * $"o_norm"), 6)
        .cast(org.apache.spark.sql.types.DecimalType(24, 6)))
      .select($"anchor_id", $"anchor_label", $"cell",
        $"other_id", $"other_label", $"sim")
    assert(rows(SimilarityModels.cellPairSims(spark, sfDir)) == rows(direct))
  }

  test("q20: the folded orders aggregate equals the two-leg join it replaced") {
    val ord = graft.catalog.Tables.orders(spark, sfDir)
      .withColumn("date_key", to_date($"o_orderdate"))
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val a = ord.groupBy($"date_key")
      .agg(count(lit(1)).as("order_count"),
        sum($"o_totalprice".cast(money))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .as("total_price"))
    val b = ord.groupBy($"date_key")
      .agg(countDistinct($"o_custkey").as("distinct_customers"))
    val twoLeg = a.join(b, Seq("date_key"))
    val folded = ord.groupBy($"date_key")
      .agg(count(lit(1)).as("order_count"),
        sum($"o_totalprice".cast(money))
          .cast(org.apache.spark.sql.types.DecimalType(38, 2))
          .as("total_price"),
        countDistinct($"o_custkey").as("distinct_customers"))
    assert(rows(folded) == rows(twoLeg))
  }
}
