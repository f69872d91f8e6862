package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomGuard

/** The bloom membership-guard surface: the published filter guarantees
  * (no false negatives ever; bounded false positives at design load),
  * the reproducible-bitset property that makes a one-pass build equal
  * any partitioned union (what CurationPipeline's incremental sidecar
  * maintenance relies on), and the SQL surface end-to-end.
  */
class BloomGuardSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._
  graft.functions.GraftFunctions.register(spark)

  private def buildOver(keys: Seq[String]): Array[Byte] =
    keys.toDF("k").agg(expr("bloom_agg(k)")).head().getAs[Array[Byte]](0)

  test("no false negatives; false positives bounded at design load") {
    val present = (0 until 20000).map(i => s"key-$i")
    val bytes = buildOver(present)
    val f = BloomGuard.heapify(bytes)
    assert(present.forall(f.query), "a bloom filter may NEVER miss")
    val absent = (0 until 20000).map(i => s"other-$i")
    val fp = absent.count(f.query)
    // 2^23 bits / 7 hashes at 20k keys is far under design load — the
    // theoretical fpp is ~0; allow a loose 0.5% for safety
    assert(fp < 100, s"$fp false positives out of 20000")
  }

  test("one-pass build ≡ union of partitioned builds (reproducible bitset)") {
    val keys = (0 until 5000).map(i => s"seg-$i")
    val whole = buildOver(keys)
    val (a, b) = keys.splitAt(1700)
    val merged = Seq(buildOver(a), buildOver(b)).toDF("bloom")
      .agg(expr("bloom_merge_agg(bloom)")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(whole, merged),
      "partitioned union must reproduce the one-pass bitset")
  }

  test("bloom_contains probes a plan-literal filter distributedly") {
    val bytes = buildOver(Seq("alpha", "beta", "gamma"))
    val probed = Seq("alpha", "beta", "gamma", "delta", "epsilon")
      .toDF("k")
      .withColumn("hit", call_function("bloom_contains", lit(bytes), $"k"))
      .as[(String, Boolean)].collect().toMap
    assert(probed("alpha") && probed("beta") && probed("gamma"))
    // delta/epsilon are overwhelmingly likely misses at 3 keys / 1 MiB
    assert(!probed("delta") && !probed("epsilon"))
  }
}
