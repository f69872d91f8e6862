package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case semantics the SURVEY flags as easy to get wrong
  * (§7.3 "UNION-distinct", §2.5 rank ties, §1.2 null handling).
  */
class OperatorSemanticsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("SQL UNION semantics require dedupe; UNION ALL keeps both") {
    val a = Seq(("2024-01-01", 1), ("2024-01-01", 2)).toDF("d", "w")
    val b = Seq(("2024-01-01", 1), ("2024-01-01", 3)).toDF("d", "w")
    assert(a.union(b).distinct().count() == 3) // UNION
    assert(a.union(b).count() == 4) // UNION ALL
  }

  test("q08 one-scan rewrite keeps UNION ALL sum semantics on all-null sides") {
    // the one-scan rewrite computes sum(bal_a)+sum(bal_b) per group; a
    // TRUE union-all sum ignores one side's nulls and keeps the other,
    // and is NULL only when BOTH sides are all-null (round-13 review:
    // the rewrite must hold without the fixture's non-null guarantee).
    // Null discount ⇒ bal_b null while bal_a stays real.
    val li = Seq(
      // group 1: discount null on every row — side B is all-null
      ("2024-01-01", Some(java.math.BigDecimal.valueOf(10.00)), None),
      ("2024-01-01", Some(java.math.BigDecimal.valueOf(4.00)), None),
      // group 2: mixed — one row's side B real
      ("2024-01-02", Some(java.math.BigDecimal.valueOf(8.00)),
        Some(0.25)),
      // group 3: price null too — BOTH sides all-null
      ("2024-01-03",
        None: Option[java.math.BigDecimal], None: Option[Double]))
      .toDF("l_shipdate", "l_extendedprice", "l_discount")
    val got = graft.models.TpchModels.unionAllBalancesFrom(li)
      .select($"date_key".cast("string"), $"avg_balance".cast("string"))
      .as[(String, String)].collect().toMap
    // group 1: union-all sum over {10, 4, null, null} = 14 over 4 obs
    assert(got("2024-01-01") == "3.500000", s"got $got")
    // group 2: {8, 8*(1-0.25)} = 14 over 2 obs
    assert(got("2024-01-02") == "7.000000", s"got $got")
    // group 3: all values null on both sides → the union's sum is NULL
    assert(got("2024-01-03") == null, s"got $got")
  }

  test("dense_rank keeps value ties in top-k (vs row_number)") {
    val df = Seq(("d1", "a", 10), ("d1", "b", 10), ("d1", "c", 5))
      .toDF("date_key", "app", "payout")
    val w = Window.partitionBy($"date_key").orderBy($"payout".desc)
    val top1 = df.withColumn("rk", dense_rank().over(w)).filter($"rk" === 1)
    assert(top1.count() == 2) // both tied apps rank 1 — deterministic
  }

  test("null app key coalesces to 0 (reference null-as-domain-value)") {
    val df = Seq(("""{"k": 7}""", 1), ("""{}""", 2), (null: String, 3))
      .toDF("props", "id")
      .select(coalesce(get_json_object($"props", "$.k").cast("int"), lit(0))
        .as("app_id"))
    assert(df.as[Int].collect().sorted.toSeq == Seq(0, 0, 7))
  }

  test("closing-balance tie-break is total: ts, event_id, side") {
    // two observations for the same wallet at the identical timestamp:
    // the (ts desc, event_id desc, side desc) order must pick exactly one
    val rows = Seq(
      ("2024-01-01 10:00:00", 1L, 5L, BigDecimal("10.00"), "from"),
      ("2024-01-01 10:00:00", 1L, 5L, BigDecimal("20.00"), "to"))
      .toDF("ts_s", "event_id", "wallet_id", "balance", "side")
      .withColumn("ts", to_timestamp($"ts_s"))
      .withColumn("date_key", to_date($"ts"))
    val w = Window.partitionBy($"wallet_id", $"date_key")
      .orderBy($"ts".desc, $"event_id".desc, $"side".desc)
    val top = rows.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val only = top.select($"side", $"balance").as[(String, BigDecimal)].head()
    assert(only._1 == "to" && only._2 == BigDecimal("20.00"))
  }

  test("explode-to-equi rolling window counts partial leading windows") {
    // wallet active on day 1 serves anchors d1..d7; matches the BETWEEN
    // range-join semantics of the oracle
    val pairs = Seq(("2024-01-01", 1L), ("2024-01-03", 2L))
      .toDF("dk", "wallet_id")
      .select(to_date($"dk").as("date_key"), $"wallet_id")
    val days = pairs.select($"date_key").distinct()
      .withColumnRenamed("date_key", "anchor_date")
    val out = pairs
      .withColumn("anchor_date",
        explode(sequence($"date_key", date_add($"date_key", 6))))
      .join(days, Seq("anchor_date"), "left_semi")
      .groupBy($"anchor_date")
      .agg(countDistinct($"wallet_id").as("n"))
      .orderBy($"anchor_date")
      .as[(java.sql.Date, Long)].collect()
    assert(out.toSeq.map(_._2) == Seq(1L, 2L)) // d1: {1}; d3: {1,2}
  }

  test("decimal cast of double uses 2-dp exact values") {
    val df = Seq(185.22, 9.64).toDF("v")
      .select($"v".cast("decimal(18,2)").as("d"))
    assert(df.as[BigDecimal].collect().toSet ==
      Set(BigDecimal("185.22"), BigDecimal("9.64")))
  }
}
