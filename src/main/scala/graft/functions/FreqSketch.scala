package graft.functions

import org.apache.datasketches.common.SketchesArgumentException
import org.apache.datasketches.frequencies.{ErrorType, LongsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Frequent-items (heavy-hitters) sketches as native aggregates — the
  * MERGEABLE sibling of the exact top-k tier (`functions/TopKLongs.scala`,
  * t06), completing the three-sketch family beside HLL distinct counts
  * (`SketchModels`) and KLL quantiles (`KllQuantile`).
  *
  * Why custom (SURVEY.md §2.10 preference order): an exact rolling
  * "top wallets over the trailing 30 days" re-aggregates 30 days of
  * per-wallet counts per anchor — at 100 TB that is a fact-sized
  * shuffle per window. The Misra-Gries/Space-Saving family
  * (DataSketches `LongsSketch`, the library Spark itself ships) gives a
  * FIXED-SIZE summary whose counts are exact within a published error
  * bound (`getMaximumError` ≤ ~3.5·n/maxMapSize) and whose merge is
  * closed — so the 100 TB shape is the same two-layer architecture as
  * the HLL/KLL tiers: kilobyte daily sketches, rolling merges over
  * sketch rows.
  *
  *  - `freq_sketch_agg(item[, maxMapSize])` — build from raw longs;
  *  - `freq_merge_agg(sketch)`             — union pre-built sketch rows;
  *  - `freq_top_k(sketch, k)`              — top-k (item, estimate,
  *    lower_bound) structs, NO_FALSE_NEGATIVES (every true heavy hitter
  *    above the error bound is present);
  *  - `freq_stream_n(sketch)`              — exact stream length.
  *
  * Accuracy contract: any item with true count > getMaximumError is
  * guaranteed reported (no false negatives), and every reported
  * estimate e satisfies true ≤ e ≤ true + maximumError. Unlike KLL,
  * the purge is deterministic, but the retained SET depends on arrival
  * order — equality specs must pin the bound, not the bytes
  * (`FreqSketchSpec`).
  */
object FreqSketch {
  /** 2^10 counters ≈ 8 KB serialized worst-case; error ≤ 3.5·n/1024. */
  val DefaultMaxMapSize = 1024

  private[functions] def extractSize(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"freq_sketch_agg's maxMapSize must be an integer literal, got $other")
  }

  private[functions] def heapify(bytes: Array[Byte]): LongsSketch =
    try LongsSketch.getInstance(Memory.wrap(bytes))
    catch { case e: SketchesArgumentException =>
      throw new IllegalArgumentException(
        "freq_*: argument is not a serialized LongsSketch", e)
    }

  val topKType: DataType = ArrayType(StructType(Seq(
    StructField("item", LongType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))))
}

/** `freq_sketch_agg(item[, maxMapSize])`: heavy-hitters sketch of a
  * long column. */
case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = FreqSketch.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "freq_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(LongType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** `freq_merge_agg(sketch)`: union serialized heavy-hitters sketch rows
  * — the rolling-window layer's aggregate. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int = FreqSketch.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[LongsSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "freq_merge_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): LongsSketch =
    new LongsSketch(maxMapSize)

  override def update(buf: LongsSketch, input: InternalRow): LongsSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(FreqSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: LongsSketch, other: LongsSketch): LongsSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: LongsSketch): Any = buf.toByteArray
  override def serialize(buf: LongsSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): LongsSketch =
    FreqSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqMergeAgg =
    copy(child = c)
}

/** `freq_top_k(sketch, k)`: the k highest-estimate items under
  * NO_FALSE_NEGATIVES, as (item, estimate, lower_bound) structs in
  * descending estimate order. Runs on aggregated rows only —
  * CodegenFallback for the same reason as `kll_value_at`. */
case class FreqTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "freq_top_k"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(left, right),
      Seq(BinaryType, IntegerType))
  override def dataType: DataType = FreqSketch.topKType
  override def nullable: Boolean = false

  override protected def nullSafeEval(sk: Any, k: Any): Any = {
    val rows = FreqSketch.heapify(sk.asInstanceOf[Array[Byte]])
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k.asInstanceOf[Int])
      .map(r => InternalRow(r.getItem, r.getEstimate, r.getLowerBound))
      .toArray[Any])
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqTopK = copy(left = l, right = r)
}

/** `freq_stream_n(sketch)`: number of updates the sketch saw (exact). */
case class FreqStreamN(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "freq_stream_n"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any): Any =
    FreqSketch.heapify(sk.asInstanceOf[Array[Byte]]).getStreamLength

  override protected def withNewChildInternal(c: Expression): FreqStreamN =
    copy(child = c)
}

/** String-item twin of the long surface, for token/vocabulary heavy
  * hitters (t06's domain at corpus scale): `ItemsSketch[String]` with
  * the library's `ArrayOfStringsSerDe` at serialization boundaries.
  * Same guarantees as [[FreqSketchAgg]]. */
object FreqStrSketch {
  import org.apache.datasketches.common.ArrayOfStringsSerDe
  import org.apache.datasketches.frequencies.ItemsSketch

  private val serde = new ArrayOfStringsSerDe()

  private[functions] def toBytes(s: ItemsSketch[String]): Array[Byte] =
    s.toByteArray(serde)

  private[functions] def heapify(bytes: Array[Byte]): ItemsSketch[String] =
    try ItemsSketch.getInstance(Memory.wrap(bytes), serde)
    catch { case e: SketchesArgumentException =>
      throw new IllegalArgumentException(
        "freq_str_*: argument is not a serialized ItemsSketch[String]", e)
    }

  val topKType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower_bound", LongType, nullable = false))))
}

/** `freq_str_sketch_agg(item[, maxMapSize])`: heavy-hitters sketch of a
  * string column. */
case class FreqStrSketchAgg(
    child: Expression,
    maxMapSize: Int = FreqSketch.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      org.apache.datasketches.frequencies.ItemsSketch[String]]
    with UnaryLike[Expression] {
  import org.apache.datasketches.frequencies.ItemsSketch

  override def prettyName: String = "freq_str_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.update(v.toString)
    buf
  }

  override def merge(buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }

  override def eval(buf: ItemsSketch[String]): Any = FreqStrSketch.toBytes(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    FreqStrSketch.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqStrSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqStrSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqStrSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqStrSketchAgg =
    copy(child = c)
}

/** `freq_str_merge_agg(sketch)`: union serialized string-item sketch
  * rows. */
case class FreqStrMergeAgg(
    child: Expression,
    maxMapSize: Int = FreqSketch.DefaultMaxMapSize,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      org.apache.datasketches.frequencies.ItemsSketch[String]]
    with UnaryLike[Expression] {
  import org.apache.datasketches.frequencies.ItemsSketch

  override def prettyName: String = "freq_str_merge_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buf: ItemsSketch[String],
      input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buf.merge(FreqStrSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: ItemsSketch[String],
      other: ItemsSketch[String]): ItemsSketch[String] = {
    buf.merge(other); buf
  }

  override def eval(buf: ItemsSketch[String]): Any = FreqStrSketch.toBytes(buf)
  override def serialize(buf: ItemsSketch[String]): Array[Byte] =
    FreqStrSketch.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqStrSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqStrMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqStrMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqStrMergeAgg =
    copy(child = c)
}

/** `freq_str_top_k(sketch, k)`: top-k (item, estimate, lower_bound)
  * string structs, NO_FALSE_NEGATIVES, descending estimate then item. */
case class FreqStrTopK(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String

  override def prettyName: String = "freq_str_top_k"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(left, right),
      Seq(BinaryType, IntegerType))
  override def dataType: DataType = FreqStrSketch.topKType
  override def nullable: Boolean = false

  override protected def nullSafeEval(sk: Any, k: Any): Any = {
    val rows = FreqStrSketch.heapify(sk.asInstanceOf[Array[Byte]])
      .getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    new GenericArrayData(rows
      .sortBy(r => (-r.getEstimate, r.getItem))
      .take(k.asInstanceOf[Int])
      .map(r => InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound))
      .toArray[Any])
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): FreqStrTopK = copy(left = l, right = r)
}
