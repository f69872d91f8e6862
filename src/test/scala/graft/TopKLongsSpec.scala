package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKLongs

/** The custom typed Aggregator: top-k semantics vs the obvious
  * sort-take reference, multiset ties, partial-aggregate behavior.
  */
class TopKLongsSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  test("reduce/merge keep the k largest as a multiset (seeded fuzz)") {
    val agg = TopKLongs(3)
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val xs = List.fill(rnd.nextInt(40))(rnd.nextLong() % 1000)
      // arbitrary split point: reduce one half, merge with the other
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else rnd.nextInt(xs.size))
      val bufL = l.foldLeft(agg.zero)(agg.reduce)
      val bufR = r.foldLeft(agg.zero)(agg.reduce)
      val got = agg.finish(agg.merge(bufL, bufR))
      val want = xs.sorted(Ordering[Long].reverse).take(3)
      assert(got == want, s"xs=$xs")
    }
  }

  test("merge is order-insensitive (commutative up to multiset)") {
    val agg = TopKLongs(2)
    val a = Seq(1L, 5L).sorted
    val b = Seq(3L, 7L).sorted
    assert(agg.finish(agg.merge(a, b)) == agg.finish(agg.merge(b, a)))
    assert(agg.finish(agg.merge(a, b)) == Seq(7L, 5L))
  }

  test("grouped top-3 over a DataFrame matches sort-take per group") {
    val df = Seq(
      (1, 10L), (1, 30L), (1, 20L), (1, 30L), (1, 5L),
      (2, 1L), (2, 2L),
      (3, 9L)).toDF("g", "v")
    val top3 = udaf(TopKLongs(3))
    val got = df.groupBy($"g").agg(top3($"v").as("t"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got(1) == Seq(30L, 30L, 20L)) // duplicate 30 counted twice
    assert(got(2) == Seq(2L, 1L))        // short group: all values
    assert(got(3) == Seq(9L))
  }
}
