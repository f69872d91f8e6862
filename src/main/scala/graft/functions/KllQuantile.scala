package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType,
  IntegerType, LongType}

/** KLL quantile sketches as native aggregate/scalar functions — the
  * MERGEABLE-QUANTILES primitive the 100 TB rolling-percentile
  * architecture needs (`models/QuantileModels.scala`), built on the
  * DataSketches KLL library Spark itself ships for its sketch builtins.
  *
  * Why custom (SURVEY.md §2.10 / the prompt's preference order): exact
  * `percentile` is not algebraic — it buffers EVERY value per group, so
  * a rolling-window percentile over a fact table re-shuffles raw values
  * once per (anchor × window-day). Spark 4 exposes DataSketches HLL for
  * distinct counts but no mergeable quantile sketch; these two
  * `TypedImperativeAggregate`s (the same aggregation contract Spark's
  * own `hll_sketch_agg` uses: object buffer in the hash map, serialized
  * only at shuffle boundaries, map-side partial aggregation) close that
  * gap:
  *
  *  - `kll_sketch_agg(value[, k])` — build a sketch from raw doubles;
  *  - `kll_merge_agg(sketch)`      — union pre-built sketch rows;
  *  - `kll_value_at(sketch, rank)` — estimated quantile at rank ∈ [0,1];
  *  - `kll_sketch_n(sketch)`       — the stream length the sketch saw.
  *
  * The scalar readers are `CodegenFallback` by design: they run on
  * AGGREGATED rows (one per group/window), never inside the fact-scan
  * hot path, so interpreted eval costs nothing measurable while keeping
  * the implementation a direct library call.
  *
  * Accuracy contract: a k=200 KLL sketch answers any rank query within
  * ~1.65% normalized rank error with 99% confidence (datasketches.org's
  * published bound, `KllSketch.getNormalizedRankError`); COMPACTION IS
  * RANDOMIZED, so estimates are reproducible only within that bound —
  * equality specs must pin error, not bytes
  * (`QuantileSketchSpec`).
  */
object KllQuantile {
  /** DataSketches' default k: ~1.65% rank error, ~3 KB max serialized. */
  val DefaultK = 200

  private[functions] def extractK(e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"kll_sketch_agg's k must be an integer literal, got $other")
  }

  private[functions] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  // AbstractDataType (the ExpectsInputTypes route) is private[sql], so
  // graft expressions check input types explicitly, like FloatDotProduct
  private[functions] def expect(name: String,
      exprs: Seq[Expression], types: Seq[DataType]): TypeCheckResult =
    if (exprs.map(_.dataType) == types) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects (${types.map(_.catalogString).mkString(", ")}), got " +
        exprs.map(_.dataType.catalogString).mkString("(", ", ", ")"))
}

/** `kll_sketch_agg(value[, k])`: KLL sketch of a double column. */
case class KllSketchAgg(
    child: Expression,
    k: Int = KllQuantile.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "kll_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(DoubleType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllQuantile.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** `kll_merge_agg(sketch)`: union serialized KLL sketch rows — the
  * rolling-window layer's aggregate (merge N kilobyte rows, never the
  * raw values they summarize). */
case class KllMergeAgg(
    child: Expression,
    k: Int = KllQuantile.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with UnaryLike[Expression] {

  override def prettyName: String = "kll_merge_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buf.merge(KllQuantile.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray
  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllQuantile.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllMergeAgg =
    copy(child = c)
}

/** `kll_value_at(sketch, rank)`: estimated quantile value at normalized
  * rank ∈ [0,1] (INCLUSIVE criteria — the library default). NULL for an
  * empty sketch (a group whose inputs were all null). */
case class KllValueAt(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "kll_value_at"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(left, right),
      Seq(BinaryType, DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(sk: Any, rank: Any): Any = {
    val s = KllQuantile.heapify(sk.asInstanceOf[Array[Byte]])
    if (s.isEmpty) null
    else s.getQuantile(rank.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KllValueAt = copy(left = l, right = r)
}

/** `kll_sketch_n(sketch)`: number of values the sketch summarizes (the
  * exact stream length — KLL tracks n losslessly). */
case class KllSketchN(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "kll_sketch_n"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(sk: Any): Any =
    KllQuantile.heapify(sk.asInstanceOf[Array[Byte]]).getN

  override protected def withNewChildInternal(c: Expression): KllSketchN =
    copy(child = c)
}
