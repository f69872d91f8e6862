package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.scalatest.funsuite.AnyFunSuite

/** Pins the session's runtime bloom-filter contract (`GraftSession
  * .configure`): a join whose dim side carries a selective predicate gets
  * a Catalyst-injected bloom filter applied on the fact side — the 100 TB
  * "drop 99% of the fact at the scan, not after its shuffle" path. The
  * injection thresholds are sized for clusters (application side ≥ 10 GB
  * scan), so the feature is invisible at spec/bench scale; this spec
  * lowers them to prove the plan shape is available and correct, then
  * restores the session defaults.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  val spark: SparkSession = TestSpark.spark
  import spark.implicits._

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim predicate injects a fact-side bloom filter") {
    val dir = Files.createTempDirectory("graft-rtf").toString
    // fact big enough to clear the (lowered) application-side threshold,
    // dim small enough for the creation side, with a selective predicate
    (1L to 20000L).map(i => (i % 997, i)).toDF("k", "v")
      .write.parquet(s"$dir/fact")
    (0L until 997L).map(i => (i, s"d$i")).toDF("k", "name")
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // keep the probe deterministic: no broadcast fast-path swallowing
      // the join before the filter matters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter($"name" === "d13")
      val joined = fact.join(dim, "k")
      val hasBloom = joined.queryExecution.optimizedPlan.exists(
        _.expressions.exists(_.exists {
          case _: BloomFilterMightContain => true
          case _ => false
        }))
      assert(hasBloom,
        "optimized plan carries no BloomFilterMightContain on the fact side:\n" +
          joined.queryExecution.optimizedPlan.treeString)
      // and the filtered plan still returns exactly the right rows
      assert(joined.count() === (1L to 20000L).count(_ % 997 == 13))
    }
  }

  test("at engine-default thresholds the probe plan is untouched (no spec-scale overhead)") {
    val dir = Files.createTempDirectory("graft-rtf2").toString
    (1L to 1000L).map(i => (i % 97, i)).toDF("k", "v")
      .write.parquet(s"$dir/fact")
    (0L until 97L).map(i => (i, s"d$i")).toDF("k", "name")
      .write.parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter($"name" === "d13")
    val joined = fact.join(dim, "k")
    val hasBloom = joined.queryExecution.optimizedPlan.exists(
      _.expressions.exists(_.exists {
        case _: BloomFilterMightContain => true
        case _ => false
      }))
    assert(!hasBloom,
      "bloom filter fired below the cluster-sized thresholds")
  }
}
