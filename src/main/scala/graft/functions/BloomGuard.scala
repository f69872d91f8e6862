package graft.functions

import org.apache.datasketches.filters.bloomfilter.{BloomFilter, BloomFilterBuilder}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType,
  LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bloom-filter membership guards as native aggregate/scalar functions —
  * the fifth mergeable-sketch family (HLL distinct / KLL quantiles /
  * frequent-items / theta sets / BLOOM membership), built on the
  * DataSketches BloomFilter Spark already ships.
  *
  * Why custom (SURVEY.md §2.10 / the prompt's preference order): the
  * curation pipeline's incremental segment stage verdicts every new
  * segment against the materialized keeper table (`curation_segments`),
  * which is CORPUS-sized — at 100 TB that join shuffles a multi-TB
  * table to answer a question whose overwhelming answer is "no, never
  * seen". A kilobytes-to-megabytes bloom sidecar answers "definitely
  * new" for the bulk of segments with NO false negatives, so the exact
  * keeper join runs only over the (tiny) maybe-known slice — the same
  * pruning contract as Spark's own runtime bloom-filter join reduction,
  * but as a PERSISTED, incrementally-maintained table. Spark exposes
  * its BloomFilterAggregate only to the internal runtime-filter rule,
  * not as a SQL surface; these close that gap:
  *
  *  - `bloom_agg(str)`            — build a filter from string keys;
  *  - `bloom_merge_agg(filter)`   — OR pre-built filter rows (union);
  *  - `bloom_contains(filter, s)` — membership probe (false ⇒ DEFINITELY
  *                                  absent; true ⇒ maybe present).
  *
  * All filters use the same fixed (bits, hashes, seed) geometry so
  * every pair is union-compatible and a bitset is REPRODUCIBLE: a
  * filter built in one pass over N keys is byte-identical to the union
  * of filters over any partition of those keys (BloomGuardSpec pins
  * both properties plus the no-false-negative guarantee).
  *
  * The scalar probe is `CodegenFallback` but heapify-per-call is NOT
  * paid in the hot path: callers pass the serialized filter as a plan
  * literal, and [[BloomContains]] caches the deserialized filter per
  * (expression-instance, byte-array identity) — one heapify per task,
  * library-call probes thereafter.
  */
object BloomGuard {
  /** 2²³ bits = 1 MiB bitset, 7 hashes: ≤1% false positives to ~800k
    * distinct keys, degrading gracefully (never losing the no-false-
    * negative guarantee) beyond. */
  val DefaultBits: Long = 1L << 23
  val DefaultHashes: Int = 7
  /** Fixed seed — union compatibility requires equal seeds. */
  val Seed: Long = 9001L

  def empty(): BloomFilter =
    BloomFilterBuilder.createBySize(DefaultBits, DefaultHashes, Seed)

  def heapify(bytes: Array[Byte]): BloomFilter =
    BloomFilter.heapify(Memory.wrap(bytes))
}

/** `bloom_agg(str)`: bloom filter over a string key column. */
case class BloomAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {

  override def prettyName: String = "bloom_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter = BloomGuard.empty()

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.union(other); buf
  }

  override def eval(buf: BloomFilter): Any = buf.toByteArray
  override def serialize(buf: BloomFilter): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomGuard.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
}

/** `bloom_merge_agg(filter)`: union serialized bloom-filter rows. */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter]
    with UnaryLike[Expression] {

  override def prettyName: String = "bloom_merge_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): BloomFilter = BloomGuard.empty()

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.union(BloomGuard.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.union(other); buf
  }

  override def eval(buf: BloomFilter): Any = buf.toByteArray
  override def serialize(buf: BloomFilter): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomGuard.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomMergeAgg =
    copy(child = c)
}

/** `bloom_contains(filter, str)`: membership probe. The common calling
  * shape is a CONSTANT serialized filter (a plan literal broadcast with
  * the task) probed once per row — the deserialized filter is cached
  * per byte-array identity so heapify is paid once per task, not once
  * per row. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "bloom_contains"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(left, right),
      Seq(BinaryType, StringType))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true

  // identity-keyed single-slot cache: literal bytes are one stable array
  // per task, so this hits every row after the first
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedFilter: BloomFilter = _

  override protected def nullSafeEval(fb: Any, s: Any): Any = {
    val bytes = fb.asInstanceOf[Array[Byte]]
    if (cachedFilter == null || (cachedBytes ne bytes)) {
      cachedBytes = bytes
      cachedFilter = BloomGuard.heapify(bytes)
    }
    cachedFilter.query(s.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomContains = copy(left = l, right = r)
}
