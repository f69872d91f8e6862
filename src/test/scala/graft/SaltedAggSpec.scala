package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The salting pattern for skewed keys (SURVEY §7.4.5): a two-phase
  * salted aggregation must equal the plain aggregation while splitting a
  * hot key across `salt` partial groups.
  */
class SaltedAggSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase aggregation equals plain aggregation") {
    // skew: wallet 0 holds 90% of rows (the hot-wallet shape)
    val rows = (1 to 9000).map(i => (0L, BigDecimal(i % 97))) ++
      (1 to 1000).map(i => (1L + i % 10, BigDecimal(i % 53)))
    val df = rows.toDF("wallet_id", "amount")
    val salts = 16
    // phase 1: aggregate on (key, salt) — the hot key spreads over 16
    // reducers; phase 2: re-aggregate the 16 partials per key
    val salted = df
      .withColumn("salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy($"wallet_id", $"salt")
      .agg(sum($"amount").as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy($"wallet_id")
      .agg(sum($"partial_sum").as("total"), sum($"partial_n").as("n"))
    val plain = df.groupBy($"wallet_id")
      .agg(sum($"amount").as("total"), count(lit(1)).as("n"))
    val a = salted.orderBy($"wallet_id")
      .as[(Long, BigDecimal, Long)].collect().toSeq
    val b = plain.orderBy($"wallet_id")
      .as[(Long, BigDecimal, Long)].collect().toSeq
    assert(a == b)
    // the hot key really did split into multiple partials
    val partials = df
      .withColumn("salt", pmod(monotonically_increasing_id(), lit(salts)))
      .groupBy($"wallet_id", $"salt").count()
      .filter($"wallet_id" === 0).count()
    assert(partials > 1)
  }
}
