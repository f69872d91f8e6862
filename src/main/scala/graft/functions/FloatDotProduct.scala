package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: dot product of two float arrays, summed in
  * double with a strict left-to-right fold.
  *
  * Why custom (SURVEY.md §2.10 / prompt's preference order): the builtin
  * formulation `aggregate(zip_with(a, b, _*_), 0d, _+_)` runs the lambda
  * machinery interpreted per element — it is the hot loop of every
  * embedding-similarity operator. This expression participates in
  * whole-stage codegen: the generated Java is a tight primitive loop over
  * the two `ArrayData` buffers, no per-element boxing or closure calls.
  *
  * Semantics match the builtin fold exactly (same order, same double
  * arithmetic) INCLUDING the edge cases: mismatched lengths yield NULL
  * (zip_with pads the shorter side with null, and the builtin sum of a
  * null product is null), and a null element anywhere yields NULL —
  * never a silent truncation or a 0.0 read. So results — and the
  * DuckDB oracle comparisons — are unchanged for the fixed-dimension
  * non-null embeddings, and future callers can't be silently wrong.
  */
case class FloatDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot expects two array<float> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  // nullable even over non-null inputs: mismatch/null-element → NULL
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDotProduct =
    copy(left = newLeft, right = newRight)
}

/** [[FloatDotProduct]]'s double-array sibling: dot product of two
  * `array<double>` columns with the same strict left-to-right fold.
  * The trained-ANN tier ([[graft.models.KMeans]], cell assignment,
  * d09's within-cell pair scoring) runs its hot loops over DOUBLE
  * mirrors of the embeddings (`doubledEmb` — DuckDB has no float32
  * list math), so the interpreted `aggregate(zip_with(...))`
  * formulation sat on the hottest path the float expression couldn't
  * serve. Identical fold order and arithmetic to the builtin — every
  * oracle comparison is unchanged — and identical edge semantics
  * (NULL on length mismatch or null element; see [[FloatDotProduct]]).
  */
case class DoubleDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_dot expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Squared-L2 sibling (Σ (aᵢ−bᵢ)², left-to-right) — the PQ/residual
  * codebook metric's hot loop. Same fold semantics as the builtin
  * `aggregate(zip_with(a, b, (x,y) => (x−y)²), 0d, _+_)` it replaces,
  * including NULL on length mismatch or null element.
  */
case class DoubleL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"double_l2 expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "double_l2"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleL2 =
    copy(left = newLeft, right = newRight)
}

/** Registration of graft's native expressions into a session's function
  * registry (idempotent; callable from any model builder regardless of
  * who constructed the session — the driver builds its own).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    def reg(name: String, clazz: Class[_],
        builder: Seq[Expression] => Expression): Unit =
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder)

    reg("float_dot", classOf[FloatDotProduct], { children =>
      require(children.size == 2, "float_dot takes exactly 2 arguments")
      FloatDotProduct(children.head, children(1))
    })
    reg("double_dot", classOf[DoubleDotProduct], { children =>
      require(children.size == 2, "double_dot takes exactly 2 arguments")
      DoubleDotProduct(children.head, children(1))
    })
    reg("double_l2", classOf[DoubleL2], { children =>
      require(children.size == 2, "double_l2 takes exactly 2 arguments")
      DoubleL2(children.head, children(1))
    })
    reg("zorder_key", classOf[ZOrderKey], { children =>
      require(children.size == 2, "zorder_key takes exactly 2 arguments")
      // integral inputs widen here (the expression itself is long-only)
      ZOrderKey(
        org.apache.spark.sql.catalyst.expressions.Cast(children.head, LongType),
        org.apache.spark.sql.catalyst.expressions.Cast(children(1), LongType))
    })
    // the KLL mergeable-quantiles surface (functions/KllQuantile.scala)
    reg("kll_sketch_agg", classOf[KllSketchAgg], {
      case Seq(v) => KllSketchAgg(v)
      case Seq(v, k) => KllSketchAgg(v, KllQuantile.extractK(k))
      case other => throw new IllegalArgumentException(
        s"kll_sketch_agg takes 1 or 2 arguments, got ${other.size}")
    })
    reg("kll_merge_agg", classOf[KllMergeAgg], {
      case Seq(s) => KllMergeAgg(s)
      case Seq(s, k) => KllMergeAgg(s, KllQuantile.extractK(k))
      case other => throw new IllegalArgumentException(
        s"kll_merge_agg takes 1 or 2 arguments, got ${other.size}")
    })
    reg("kll_value_at", classOf[KllValueAt], { children =>
      require(children.size == 2, "kll_value_at takes exactly 2 arguments")
      KllValueAt(children.head, children(1))
    })
    reg("kll_sketch_n", classOf[KllSketchN], { children =>
      require(children.size == 1, "kll_sketch_n takes exactly 1 argument")
      KllSketchN(children.head)
    })
    // the heavy-hitters surface (functions/FreqSketch.scala)
    reg("freq_sketch_agg", classOf[FreqSketchAgg], {
      case Seq(v) => FreqSketchAgg(v)
      case Seq(v, m) => FreqSketchAgg(v, FreqSketch.extractSize(m))
      case other => throw new IllegalArgumentException(
        s"freq_sketch_agg takes 1 or 2 arguments, got ${other.size}")
    })
    reg("freq_merge_agg", classOf[FreqMergeAgg], {
      case Seq(s) => FreqMergeAgg(s)
      case Seq(s, m) => FreqMergeAgg(s, FreqSketch.extractSize(m))
      case other => throw new IllegalArgumentException(
        s"freq_merge_agg takes 1 or 2 arguments, got ${other.size}")
    })
    reg("freq_top_k", classOf[FreqTopK], { children =>
      require(children.size == 2, "freq_top_k takes exactly 2 arguments")
      FreqTopK(children.head, children(1))
    })
    reg("freq_stream_n", classOf[FreqStreamN], { children =>
      require(children.size == 1, "freq_stream_n takes exactly 1 argument")
      FreqStreamN(children.head)
    })
    reg("freq_str_sketch_agg", classOf[FreqStrSketchAgg], {
      case Seq(v) => FreqStrSketchAgg(v)
      case Seq(v, m) => FreqStrSketchAgg(v, FreqSketch.extractSize(m))
      case other => throw new IllegalArgumentException(
        s"freq_str_sketch_agg takes 1 or 2 arguments, got ${other.size}")
    })
    reg("freq_str_merge_agg", classOf[FreqStrMergeAgg], {
      case Seq(s) => FreqStrMergeAgg(s)
      case Seq(s, m) => FreqStrMergeAgg(s, FreqSketch.extractSize(m))
      case other => throw new IllegalArgumentException(
        s"freq_str_merge_agg takes 1 or 2 arguments, got ${other.size}")
    })
    reg("freq_str_top_k", classOf[FreqStrTopK], { children =>
      require(children.size == 2, "freq_str_top_k takes exactly 2 arguments")
      FreqStrTopK(children.head, children(1))
    })
    // the theta set-operation surface (functions/ThetaSketch.scala)
    reg("theta_sketch_agg", classOf[ThetaSketchAgg], { children =>
      require(children.size == 1, "theta_sketch_agg takes exactly 1 argument")
      ThetaSketchAgg(children.head)
    })
    reg("theta_union_agg", classOf[ThetaUnionAgg], { children =>
      require(children.size == 1, "theta_union_agg takes exactly 1 argument")
      ThetaUnionAgg(children.head)
    })
    reg("theta_intersect", classOf[ThetaIntersect], { children =>
      require(children.size == 2, "theta_intersect takes exactly 2 arguments")
      ThetaIntersect(children.head, children(1))
    })
    reg("theta_estimate", classOf[ThetaEstimate], { children =>
      require(children.size == 1, "theta_estimate takes exactly 1 argument")
      ThetaEstimate(children.head)
    })
    // the bloom membership-guard surface (functions/BloomGuard.scala)
    reg("bloom_agg", classOf[BloomAgg], { children =>
      require(children.size == 1, "bloom_agg takes exactly 1 argument")
      BloomAgg(children.head)
    })
    reg("bloom_merge_agg", classOf[BloomMergeAgg], { children =>
      require(children.size == 1, "bloom_merge_agg takes exactly 1 argument")
      BloomMergeAgg(children.head)
    })
    reg("bloom_contains", classOf[BloomContains], { children =>
      require(children.size == 2, "bloom_contains takes exactly 2 arguments")
      BloomContains(children.head, children(1))
    })
  }
}
