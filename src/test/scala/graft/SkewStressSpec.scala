package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew stress (SURVEY §7.4.5): one hot wallet owning ~25% of events —
  * the shape a viral app produces at 100 TB. The engine's three-tier
  * strategy, each tier pinned by a spec:
  *
  *  - JOIN skew → AQE's OptimizeSkewedJoin splits the oversized shuffle
  *    partition and replicates the matching side (THIS spec asserts the
  *    split actually fires on a hot-wallet equi-join under the
  *    GraftSession config);
  *  - AGGREGATE skew → two-phase salting (SaltedAggSpec proves the
  *    rewrite is result-identical);
  *  - WINDOW skew (the q19/q44 per-wallet windows) → cannot be split
  *    (per-key ordered state must co-locate), but per-key work is
  *    LINEAR in that key's rows by construction — a hot wallet bounds
  *    one partition's sort, never a cross-key product.
  *
  * Thresholds are lowered to fire at spec scale; production keeps the
  * Spark 4 defaults (256 MB / factor 5) that GraftSession leaves
  * untouched.
  */
class SkewStressSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def withConfs[T](confs: (String, String)*)(body: => T): T = {
    val old = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot-wallet shuffle partition in a skewed join") {
    withConfs(
      // force a real shuffle join (no broadcast escape hatch)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // fire at unit-test bytes instead of 256 MB
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
      // the join output re-shuffles for the segment aggregate anyway,
      // so the split costs nothing extra — but AQE's conservative "no
      // new shuffles" rule needs the explicit opt-in to see that
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      // wallet 0 owns 25% of 200k padded events; 999 cold wallets share
      // the rest — the q06/q28 wallet-join shape under a viral app
      val events = spark.range(200000L).select(
        when($"id" % 4 === 0, 0L).otherwise($"id" % 999 + 1)
          .as("wallet_id"),
        ($"id" % 30).as("day"),
        md5($"id".cast("string")).as("pad"))
      val dim = spark.range(1000L)
        .select($"id".as("wallet_id"),
          ($"id" % 7).as("segment"))
      val joined = events.join(dim, Seq("wallet_id"))
        .groupBy($"segment").agg(count(lit(1)).as("n"))
      // AQE finalizes the plan at runtime — execute THIS dataframe,
      // then inspect its own (now-final) adaptive plan
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum == 200000L) // every event matched once
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the hot-wallet join as skewed:\n$plan")
    }
  }

  test("hot-wallet window queries stay linear: one partition sorts one wallet") {
    // q44's sessionization shape over the same skewed distribution:
    // correctness is insensitive to the skew, and the per-wallet window
    // never multiplies rows (output sessions ≤ input events)
    val ev = spark.range(40000L).select(
      when($"id" % 4 === 0, 0L).otherwise($"id" % 999 + 1)
        .as("wallet_id"),
      ($"id" * 1800L * 1000000L).as("ts_us")) // 30-min spacing
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"wallet_id").orderBy($"ts_us")
    val sessions = ev
      .withColumn("new_session",
        when($"ts_us" - lag($"ts_us", 1).over(w) > 21600L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum($"new_session").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)))
      .groupBy($"wallet_id", $"session_idx")
      .agg(count(lit(1)).as("n_events"))
    val byWallet = sessions.groupBy($"wallet_id")
      .agg(sum($"n_events").as("events"))
    // every event lands in exactly one session — no fan-out under skew
    assert(byWallet.agg(sum($"events")).head().getLong(0) == 40000L)
    // the hot wallet's events all arrived (10k of 40k)
    assert(byWallet.filter($"wallet_id" === 0L).head().getLong(1) == 10000L)
  }
}
