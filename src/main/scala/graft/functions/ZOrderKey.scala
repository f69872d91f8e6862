package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: the Morton (Z-order) interleave of two
  * integral keys — `zorder_key(a, b)` returns the long whose even bits
  * are `a`'s and odd bits are `b`'s.
  *
  * Why (SURVEY.md §2.10 preference order, same rationale as
  * `float_dot`): single-column clustering (`ModelDef.clusterBy`) gives
  * row-group min/max pruning on ONE key; sorting by a Z-order key gives
  * useful pruning on BOTH — points close on the Z-curve are close in
  * (a, b) space, so each written row group covers a small rectangle of
  * the key domain and a predicate on either column skips most groups
  * (the lakehouse OPTIMIZE ZORDER BY technique, here as a plain
  * expression usable anywhere a sort key is). The bit-spread is six
  * shift/mask steps, branch-free, inside whole-stage codegen.
  *
  * Domain: the LOW 31 BITS of each input participate (IDs ≥ 2^31 wrap
  * onto the same curve tile; negative inputs are masked the same way),
  * keeping the result non-negative so signed-long ordering IS curve
  * ordering. Null in → null out. Integer inputs widen via the implicit
  * cast.
  */
case class ZOrderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects two bigint arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_key"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    ZOrderKey.interleave(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrderKey$$.MODULE$$.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderKey =
    copy(left = newLeft, right = newRight)
}

object ZOrderKey {
  /** Spread the low 31 bits of `x0` onto the even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def interleave(a: Long, b: Long): Long =
    spread(a) | (spread(b) << 1)
}
