package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulBalance

/** flatMapGroupsWithState running balance: state folds correctly across
  * micro-batches and ends equal to the batch aggregate.
  */
class StatefulBalanceSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("stateful running balance converges to the batch sum per wallet") {
    val base = Files.createTempDirectory("graft-state").toString
    val in = s"$base/in"
    val ev = graft.catalog.Tables.events(spark, "/root/testdata/sf0.001")
    // two files → the availableNow run still processes them as a stream
    ev.filter($"event_id" % 2 === 0).write.parquet(in)
    ev.filter($"event_id" % 2 === 1).write.mode("append").parquet(in)
    val q = StatefulBalance.runningBalances(spark, in)
      .writeStream
      .outputMode("append")
      .format("memory")
      .queryName("balances")
      .option("checkpointLocation", s"$base/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val finalBal = spark.table("balances")
      .groupBy($"wallet_id")
      .agg(max($"events").as("n"), max_by($"balance", $"events").as("balance"))
    val expected = ev.filter($"event_type" =!= "error")
      .groupBy($"user_id".as("wallet_id"))
      .agg(count(lit(1)).as("n"), sum($"value").as("balance"))
    val got = finalBal.orderBy($"wallet_id")
      .as[(Long, Long, Double)].collect().toSeq
    val exp = expected.orderBy($"wallet_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == exp.map(t => (t._1, t._2)))
    // balances equal within float tolerance (different fold orders)
    got.zip(exp).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-6, s"wallet ${g._1}")
    }
    // one update row per event (emit-per-event contract)
    assert(spark.table("balances").count() ==
      ev.filter($"event_type" =!= "error").count())
  }
}
