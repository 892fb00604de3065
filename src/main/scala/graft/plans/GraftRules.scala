package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CaseWhen, Coalesce, ElementAt, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule (SURVEY §4 showcase, injected via
  * `GraftExtensions.injectOptimizerRule`): simplify the ANSI-safe guarded
  * alias-map lookup emitted by `Normalize.normalizeTeamName`
  *
  * {{{ CASE WHEN map_contains_key(m, k) THEN element_at(m, k) ELSE k END }}}
  *
  * into {{{ coalesce(element_at(m, k), k) }}} — one literal-map probe per
  * row instead of two. Equivalent only when `element_at` is null-on-miss
  * and the map's values are non-null, so the rule fires only with ANSI
  * mode off and a value-null-free literal map (exactly what
  * `normalizeTeamName` builds via `typedLit`).
  */
object AliasLookupSimplification extends Rule[LogicalPlan] {

  private def isNullFreeLiteralMap(e: Expression): Boolean = e match {
    case Literal(m: org.apache.spark.sql.catalyst.util.MapData,
        t: org.apache.spark.sql.types.MapType) =>
      !t.valueContainsNull || {
        val values = m.valueArray()
        (0 until m.numElements()).forall(i => !values.isNullAt(i))
      }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SQLConf.get.ansiEnabled) plan
    else plan.transformAllExpressions {
      case CaseWhen(Seq((cond, ElementAt(m1, k1, _, _))), Some(elseValue))
          if isNullFreeLiteralMap(m1) &&
            cond.semanticEquals(mapContainsKey(m1, k1)) &&
            elseValue.semanticEquals(k1) =>
        Coalesce(Seq(ElementAt(m1, k1), elseValue))
    }

  private def mapContainsKey(m: Expression, k: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.MapContainsKey(m, k)
}
