package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType}

/** Planner-level rewrite of constant-width date-range joins (SURVEY §4
  * optional component; preference tier (c): LogicalPlan rule registered
  * through `SparkSessionExtensions`).
  *
  * The reference's rolling-window models join on
  * `txn.date_key BETWEEN dateadd('day', -k, anchor.date_key) AND
  * anchor.date_key` (e.g. `daily_volatility_factor.sql:25-36`,
  * `monthly_active_accounts_app.sql:19-38`). Spark plans a non-equi
  * inner join as BroadcastNestedLoopJoin — O(|A|·|B|) compares, the
  * scale-killer SURVEY §2.3 J4 flags. The hand-written models here
  * avoid it with the explode-to-equi rewrite; THIS rule applies the
  * same rewrite automatically at the planner level, so a user writing
  * the natural BETWEEN join on THIS engine still gets the linear plan:
  *
  *   d >= date_sub(a, k) AND d <= a
  *     ⇒  explode(sequence(d, d+k)) AS anchor  JOIN ON anchor = a
  *
  * Shifted windows — `d BETWEEN date_sub(a, k1) AND date_sub(a, k2)`
  * (the reference's weekly payout window `kre_weekly_payout.sql`:
  * previous-week Sunday..Saturday per week anchor, k1=8, k2=2) —
  * rewrite the same way with the sequence shifted by the lower shift:
  *
  *   d >= date_sub(a, k1) AND d <= date_sub(a, k2)
  *     ⇒  explode(sequence(d+k2, d+k1)) AS anchor  JOIN ON anchor = a
  *
  * Row multiplicity is identical (each (row_d, row_a) pair with
  * a−k1 ≤ d ≤ a−k2 matches exactly once on anchor = a, since
  * d+k2 ≤ a ≤ d+k1 ⟺ the original bounds); extra conjuncts in the
  * original condition are preserved on the rewritten join. Fan-out is
  * the constant k1−k2+1 — linear shuffle volume, never a nested loop.
  *
  * OUTER joins rewrite when the date-carrying side `d` is the join's
  * NON-preserved side — the reference's own left-range shape
  * (`daily_active_user_balance_by_app.sql:47-49`: anchors LEFT JOIN
  * balance rows on `bal.date_key BETWEEN a−29 AND a`). Exploded copies
  * of an inner-side row that match nothing are simply dropped, and a
  * preserved row with no match in its window null-extends exactly once
  * — multiplicity is untouched, no collapse step needed. When `d` sits
  * on the PRESERVED side the rewrite is unsound as-is (a preserved row
  * whose window matches on some anchors but not others would emit
  * spurious null-extended copies; collapsing them needs a row identity
  * the plan doesn't carry), so that shape — absent from the reference
  * corpus — is left to Spark's nested-loop plan.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Max window width worth exploding: beyond this the fan-out cost
    * outweighs the nested-loop it replaces only for very large sides. */
  private val MaxDays = 3700

  /** `d >= date_sub(a, k)` (either comparison orientation). */
  private def lowerBound(e: Expression): Option[(Attribute, Attribute, Int)] =
    e match {
      case GreaterThanOrEqual(d: Attribute,
          DateSub(a: Attribute, Literal(k: Int, IntegerType))) =>
        Some((d, a, k))
      case LessThanOrEqual(DateSub(a: Attribute, Literal(k: Int, IntegerType)),
          d: Attribute) =>
        Some((d, a, k))
      case _ => None
    }

  /** `d <= a` (shift 0) or `d <= date_sub(a, k2)` (shift k2), either
    * comparison orientation. */
  private def upperBound(e: Expression): Option[(Attribute, Attribute, Int)] =
    e match {
      case LessThanOrEqual(d: Attribute, a: Attribute) => Some((d, a, 0))
      case GreaterThanOrEqual(a: Attribute, d: Attribute) => Some((d, a, 0))
      case LessThanOrEqual(d: Attribute,
          DateSub(a: Attribute, Literal(k2: Int, IntegerType))) =>
        Some((d, a, k2))
      case GreaterThanOrEqual(DateSub(a: Attribute, Literal(k2: Int, IntegerType)),
          d: Attribute) =>
        Some((d, a, k2))
      case _ => None
    }

  /** A join type this rule can rewrite with the date side `dOnLeft`:
    * inner always; an outer join only when the exploding (date) side is
    * its non-preserved side (see scaladoc — exploding a preserved side
    * breaks the one-null-row-per-unmatched multiplicity). */
  private def rewritable(jt: JoinType, dOnLeft: Boolean): Boolean =
    jt match {
      case Inner => true
      case LeftOuter => !dOnLeft
      case RightOuter => dOnLeft
      case _ => false
    }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, jt @ (Inner | LeftOuter | RightOuter),
        Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = for {
        lo <- conjuncts
        hi <- conjuncts
        if lo ne hi
        (d1, a1, k) <- lowerBound(lo)
        (d2, a2, k2) <- upperBound(hi)
        if d1.semanticEquals(d2) && a1.semanticEquals(a2)
        if d1.dataType == DateType && a1.dataType == DateType
        if k > k2 && k2 >= 0 && (k - k2) <= MaxDays
        // d and a must come from opposite sides
        if (left.outputSet.contains(d1) && right.outputSet.contains(a1)) ||
          (right.outputSet.contains(d1) && left.outputSet.contains(a1))
        if rewritable(jt, left.outputSet.contains(d1))
      } yield {
        val dOnLeft = left.outputSet.contains(d1)
        val (dSide, aSide) = if (dOnLeft) (left, right) else (right, left)
        // Sequence is TimeZoneAwareExpression — without a timeZoneId the
        // node stays unresolved and the optimizer rejects the plan
        val seqStart = if (k2 == 0) d1 else DateAdd(d1, Literal(k2))
        val gen = Explode(
          new Sequence(seqStart, DateAdd(d1, Literal(k)), None,
            Some(conf.sessionLocalTimeZone)))
        val anchor = AttributeReference("graft_range_anchor", DateType)()
        val generate =
          Generate(gen, Nil, outer = false, None, Seq(anchor), dSide)
        val rest = conjuncts.filter(c => (c ne lo) && (c ne hi))
        val newCond = (EqualTo(anchor, a1) +: rest).reduce(And)
        val newJoin =
          if (dOnLeft) Join(generate, aSide, jt, Some(newCond), hint)
          else Join(aSide, generate, jt, Some(newCond), hint)
        // restore the original output (drop the generated anchor column)
        Project(j.output, newJoin)
      }
      rewritten.headOption.getOrElse(j)
  }
}

/** `SparkSessionExtensions` installer:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.plans.GraftExtensions` in cluster conf.
  * (An existing session can also opt in via
  * `spark.experimental.extraOptimizations` +
  * `graft.functions.GraftFunctions.register`.)
  *
  * Installs the planner rule AND the engine's native SQL functions
  * (`float_dot` — the codegen'd embedding dot product), so the pure-SQL
  * surface gets the same codegen path the DataFrame API uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RangeJoinRewrite)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.FloatDotProduct].getName, "float_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "float_dot takes exactly 2 arguments")
        graft.functions.FloatDotProduct(children.head, children(1))
      }))
  }
}
