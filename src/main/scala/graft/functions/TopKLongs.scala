package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact top-k largest longs per group — the UDAF-style custom
  * aggregator (SURVEY.md §2.10): a typed
  * `org.apache.spark.sql.expressions.Aggregator` registered through
  * `functions.udaf`, the Spark-native replacement for a Snowflake
  * user-defined aggregate.
  *
  * The buffer is an ascending-sorted Seq of ≤ k elements (current min
  * at the head); reduce/merge admit a value only when the buffer is
  * short or the value beats the current min. State is O(k) per group
  * REGARDLESS of group size, and merge is associative+commutative, so
  * it runs as a partial aggregate (map-side combine) — constant-memory
  * exact top-k per key at any data scale. Multiset semantics:
  * duplicates count separately, matching `ORDER BY v DESC LIMIT k`.
  */
final case class TopKLongs(k: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  def zero: Seq[Long] = Seq.empty

  private def insert(b: Seq[Long], v: Long): Seq[Long] =
    if (b.size < k) (b :+ v).sorted
    else if (v > b.head) (b.tail :+ v).sorted
    else b

  def reduce(b: Seq[Long], a: Long): Seq[Long] = insert(b, a)

  def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] =
    b2.foldLeft(b1)(insert)

  /** Output is descending — the natural "top k" presentation. */
  def finish(b: Seq[Long]): Seq[Long] = b.sorted(Ordering[Long].reverse)

  def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
