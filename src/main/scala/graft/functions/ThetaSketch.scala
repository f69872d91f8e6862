package graft.functions

import org.apache.datasketches.common.SketchesArgumentException
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch,
  Sketches, Union, UpdateSketch}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Theta sketches as native aggregates — the SET-OPERATION member of
  * the sketch family (HLL distinct counts, KLL quantiles, frequent
  * items, now theta): the one sketch whose INTERSECTION is closed with
  * published error, which is what retention/overlap analytics need.
  *
  * Why custom (SURVEY.md §2.10 preference order): "wallets active in
  * period A AND period B" is exact-expressible as a self-join of
  * distinct sets — a fact-sized shuffle PER (A, B) PAIR, quadratic in
  * the number of periods compared (the q15/q18 churn models each pay
  * one such pass). Spark 4's HLL builtins union but cannot intersect.
  * A per-day theta sketch table (kilobyte rows, same two-layer shape
  * as the other tiers) answers ANY period-overlap question — N-week
  * retention triangles, cohort decay — by set algebra over sketch
  * rows:
  *
  *  - `theta_sketch_agg(item)`     — build from raw longs;
  *  - `theta_union_agg(sketch)`    — union serialized sketch rows;
  *  - `theta_intersect(a, b)`      — scalar intersection of two sketches;
  *  - `theta_estimate(sketch)`     — distinct-count estimate.
  *
  * Accuracy: union keeps the configured nominal-entries error
  * (~1.6% RSE at lgK=12); intersection error grows with set-size
  * disparity (the published bound tracks the smaller set) —
  * `ThetaSketchSpec` pins observed error against exact intersections
  * on real data. Estimates are order-independent for fixed inputs, but
  * NOT byte-reproducible across partitionings — specs pin estimates
  * within bounds, never bytes.
  */
object ThetaSketch {
  /** lgK=12 → 4096 nominal entries, ~1.6% RSE, ≤32 KB serialized. */
  val DefaultLgK = 12

  private[functions] def heapify(bytes: Array[Byte]): CompactSketch =
    try Sketches.wrapCompactSketch(Memory.wrap(bytes))
    catch { case e: SketchesArgumentException =>
      throw new IllegalArgumentException(
        "theta_*: argument is not a serialized theta sketch", e)
    }

  /** Aggregation buffer: a union accumulator (absorbs raw updates and
    * sketch merges alike), compacted only at serialization points. */
  private[functions] def newUnion(): Union =
    SetOperation.builder().setLogNominalEntries(DefaultLgK).buildUnion()
}

/** `theta_sketch_agg(item)`: theta sketch of a long column. */
case class ThetaSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(LongType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion()
    u.union(ThetaSketch.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

/** `theta_union_agg(sketch)`: union serialized theta sketch rows — the
  * rolling/overlap layer's aggregate. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union]
    with UnaryLike[Expression] {

  override def prettyName: String = "theta_union_agg"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union = ThetaSketch.newUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(ThetaSketch.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult); buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = ThetaSketch.newUnion()
    u.union(ThetaSketch.heapify(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaUnionAgg =
    copy(child = c)
}

/** `theta_intersect(a, b)`: serialized intersection of two sketches —
  * the operation HLL cannot do, and the reason this tier exists. Runs
  * on aggregated rows only (CodegenFallback, like the other sketch
  * readers). */
case class ThetaIntersect(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "theta_intersect"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(left, right),
      Seq(BinaryType, BinaryType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ix = SetOperation.builder()
      .setLogNominalEntries(ThetaSketch.DefaultLgK).buildIntersection()
    ix.intersect(ThetaSketch.heapify(a.asInstanceOf[Array[Byte]]))
    ix.intersect(ThetaSketch.heapify(b.asInstanceOf[Array[Byte]]))
    ix.getResult.toByteArray
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ThetaIntersect = copy(left = l, right = r)
}

/** `theta_estimate(sketch)`: distinct-count estimate. */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "theta_estimate"
  override def checkInputDataTypes(): TypeCheckResult =
    KllQuantile.expect(prettyName, Seq(child), Seq(BinaryType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(sk: Any): Any =
    ThetaSketch.heapify(sk.asInstanceOf[Array[Byte]]).getEstimate

  override protected def withNewChildInternal(c: Expression): ThetaEstimate =
    copy(child = c)
}
