package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayContains, CaseWhen, Coalesce, ElementAt, Expression, Literal, MapContainsKey}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, MapType}

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
  *
  * Injected rules run in the operator-optimization fixpoint, AFTER
  * `ReplaceExpressions` has rewritten the `RuntimeReplaceable`
  * `MapContainsKey(m, k)` into `ArrayContains(MapKeys(m), k)` and after
  * `ConstantFolding` has folded `MapKeys(literal)` into a literal key
  * array — so the production matcher targets THAT shape (the pre-
  * replacement shape is also matched for completeness, e.g. when the
  * rule is applied to an analyzed plan directly).
  */
object AliasLookupSimplification extends Rule[LogicalPlan] {

  private def valueNullFree(m: MapData, mt: MapType): Boolean =
    !mt.valueContainsNull || {
      val values = m.valueArray()
      (0 until m.numElements()).forall(i => !values.isNullAt(i))
    }

  private def sameKeys(keys: ArrayData, keyType: DataType,
                       map: MapData, mapKeyType: DataType): Boolean =
    keyType == mapKeyType &&
      keys.numElements() == map.numElements() &&
      keys.toObjectArray(keyType)
        .sameElements(map.keyArray().toObjectArray(mapKeyType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (SQLConf.get.ansiEnabled) plan
    else plan.transformAllExpressions {
      // Production (post-ReplaceExpressions + ConstantFolding) shape:
      // CASE WHEN array_contains(<literal keys>, k) THEN
      //   element_at(<literal map>, k) ELSE k END
      case CaseWhen(Seq((
            ArrayContains(Literal(keys: ArrayData, ArrayType(kt, _)), probe),
            ea @ ElementAt(Literal(m: MapData, mt: MapType), k, _, _))),
          Some(elseValue))
          if probe.semanticEquals(k) && elseValue.semanticEquals(k) &&
            sameKeys(keys, kt, m, mt.keyType) && valueNullFree(m, mt) =>
        Coalesce(Seq(ea, elseValue))

      // Pre-replacement shape (analyzed plans).
      case CaseWhen(Seq((
            MapContainsKey(ml @ Literal(m: MapData, mt: MapType), k1),
            ea @ ElementAt(m2, k2, _, _))), Some(elseValue))
          if ml.semanticEquals(m2) && k1.semanticEquals(k2) &&
            elseValue.semanticEquals(k1) && valueNullFree(m, mt) =>
        Coalesce(Seq(ea, elseValue))
    }
}
