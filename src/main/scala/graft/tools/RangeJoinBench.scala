package graft.tools

import org.apache.spark.sql.SparkSession
import graft.GraftSession
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRewrite

/** Dev bench for the §4-optional planner rule: the same 30-day BETWEEN
  * range join executed as Spark plans it natively
  * (BroadcastNestedLoopJoin) vs under `RangeJoinRewrite`
  * (explode-to-equi). Prints both timings and the speedup.
  */
object RangeJoinBench {
  def main(args: Array[String]): Unit = {
    // this demo measures the rule OFF vs ON, so it manages
    // extraOptimizations itself — configure() only, no install()
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-rangejoinbench"), 8)
      .getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    // 1M fact rows over a 20000-day calendar; 20000 anchor days. The
    // nested loop costs |fact|·|anchors| = 2e10 compares; the rewrite
    // costs |fact|·30 generated rows — the asymmetry the rule exists for
    // (and it widens linearly with the anchor count).
    val fact = spark.range(1000000L)
      .select(date_add(lit("2010-01-01").cast("date"),
        (col("id") % 20000).cast("int")).as("date_key"),
        (col("id") * 7 % 100).as("v"))
    val anchors = spark.range(20000L)
      .select(date_add(lit("2010-01-01").cast("date"),
        col("id").cast("int")).as("anchor_date"))
    def rangeJoin() = fact.join(anchors,
      $"date_key" >= date_sub($"anchor_date", 29) &&
        $"date_key" <= $"anchor_date")

    def time(label: String)(body: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[range-bench] $label%-12s ${dt}%8.2f s   rows=$n")
      (label, dt, n)
    }

    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    val (_, tNaive, nNaive) = time("nested-loop") { rangeJoin().count() }
    spark.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    val (_, tRule, nRule) = time("rewritten") { rangeJoin().count() }
    spark.experimental.extraOptimizations = Nil
    require(nNaive == nRule, s"row mismatch: $nNaive vs $nRule")
    println(f"[range-bench] speedup ${tNaive / tRule}%.1f x (rows match: $nNaive)")
    spark.stop()
  }
}
