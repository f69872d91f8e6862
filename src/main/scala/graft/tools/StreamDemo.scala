package graft.tools

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.GraftSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingSummary

/** Dev drive of the Structured Streaming path: stage the events fixture as
  * a file-source input, run the daily summary with Trigger.AvailableNow,
  * and print what was emitted. Usage: runMain graft.tools.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.create("local[4]", 4, "graft-streamdemo")
    import spark.implicits._

    val base = Files.createTempDirectory("graft-stream-demo").toString
    val in = s"$base/in"
    graft.catalog.Tables.events(spark, sfDir).write.parquet(in)
    val q = StreamingSummary.runAvailableNow(spark, in, s"$base/ck", s"$base/out")
    q.awaitTermination()
    val out = spark.read.parquet(s"$base/out")
    println(s"[stream] emitted rows=${out.count()} " +
      s"days=${out.select($"date_key").distinct().count()}")
    out.orderBy($"date_key", $"txn_type").show(6)

    // stateful path: flatMapGroupsWithState running balances
    val q2 = graft.streaming.StatefulBalance.runningBalances(spark, in)
      .writeStream.outputMode("append").format("memory")
      .queryName("demo_balances")
      .option("checkpointLocation", s"$base/ck2")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val bal = spark.table("demo_balances")
    println(s"[stateful] updates=${bal.count()} wallets=" +
      bal.select($"wallet_id").distinct().count())
    bal.groupBy($"wallet_id").agg(max($"events").as("events"),
        org.apache.spark.sql.functions.max_by($"balance", $"events").as("final_balance"))
      .orderBy($"wallet_id").show(5)
    spark.stop()
  }
}
