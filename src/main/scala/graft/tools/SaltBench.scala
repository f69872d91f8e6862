package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev bench for the §7.4.5 skew strategy: does MANUAL key salting
  * still earn its keep on a hot key, or do map-side combine and AQE's
  * skew-join split subsume it? Three measured shapes on a 20M-row fact
  * where one wallet owns 25% of the rows (the SkewStressSpec
  * distribution at bench scale):
  *
  *   1. hot-key AGGREGATION, plain vs two-phase salted — combinable
  *      aggregates (sum/count) partial-aggregate map-side, so the hot
  *      key ships one tiny partial per map task either way;
  *   2. hot-key SHUFFLE JOIN, AQE skew split disabled vs enabled —
  *      the split replicates the dim side against the oversized fact
  *      partition (thresholds lowered to fire at dev-box bytes, the
  *      SkewStressSpec config);
  *   3. the same join MANUALLY SALTED (dim exploded ×16, fact salted
  *      on a uniform row id) — the pre-AQE remedy, paying a 16× dim
  *      blow-up for an even fact shuffle.
  *
  * Prints per-variant seconds and writes bench_runs/salt_bench.json;
  * the committed conclusion lives in COVERAGE.md §skew.
  */
object SaltBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession =
      GraftSession.create(s"local[$cpus]", cpus.toInt, "graft-saltbench")
    import spark.implicits._
    spark.sparkContext.setLogLevel("WARN")

    val salts = 16
    val nFact = 20000000L
    def fact = spark.range(nFact).select(
      when($"id" % 4 === 0, 0L).otherwise($"id" % 9999 + 1)
        .as("wallet_id"),
      ($"id" % 97).as("v"),
      // a real payload so the skewed shuffle moves real bytes
      md5($"id".cast("string")).as("pad"),
      $"id".as("rid"))
    def dim = spark.range(10000L)
      .select($"id".as("wallet_id"), ($"id" % 7).as("segment"))

    // min of two back-to-back runs — the Bench convention (single
    // samples on a shared box chased phantom regressions for 3 rounds)
    def time(label: String)(body: => Long): (String, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      val dt = math.min(once(), once())
      println(f"[salt-bench] $label%-22s ${dt}%8.2f s (min of 2)")
      (label, dt)
    }
    def withConfs[T](confs: (String, String)*)(body: => T): T = {
      val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    spark.range(2000000L).selectExpr("sum(id)").collect() // warmup

    // --- 1. aggregation: combinable agg, plain vs salted two-phase
    val aggPlain = time("agg-plain") {
      fact.groupBy($"wallet_id")
        .agg(sum($"v").as("s"), count(lit(1)).as("n")).count()
    }
    val aggSalted = time("agg-salted") {
      fact.withColumn("salt", pmod($"rid", lit(salts)))
        .groupBy($"wallet_id", $"salt")
        .agg(sum($"v").as("ps"), count(lit(1)).as("pn"))
        .groupBy($"wallet_id")
        .agg(sum($"ps").as("s"), sum($"pn").as("n")).count()
    }

    // --- 2./3. join: the payload-carrying skewed shuffle
    def joined(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, Seq("wallet_id"))
        .groupBy($"segment").agg(sum(length($"pad")).as("bytes"))
    val noBroadcast = Seq("spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val skewFire = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
    val joinNoSplit = withConfs(noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      time("join-skew-nosplit") { joined(fact).count() }
    }
    val joinAqe = withConfs(noBroadcast ++ skewFire: _*) {
      time("join-aqe-split") { joined(fact).count() }
    }
    val joinSalted = withConfs(noBroadcast ++ Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      time("join-salted") {
        val saltedDim = dim.withColumn("salt",
          explode(sequence(lit(0), lit(salts - 1))))
        fact.withColumn("salt", pmod($"rid", lit(salts)).cast("int"))
          .join(saltedDim, Seq("wallet_id", "salt"))
          .groupBy($"segment").agg(sum(length($"pad")).as("bytes"))
          .count()
      }
    }

    val results = Seq(aggPlain, aggSalted, joinNoSplit, joinAqe, joinSalted)
    val json = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",", s""","rows":$nFact,"salts":$salts}""")
    println(s"[salt-bench] $json")
    try {
      val dir = java.nio.file.Paths.get("bench_runs")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("salt_bench.json"),
        json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[salt-bench] could not write: $e")
    }
    spark.stop()
  }
}
