package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Injected optimizer rule simplifying graft's native expressions.
  *
  * Catalyst's built-in simplifications don't know our expressions'
  * algebra, so we teach it the one identity that shows up in practice:
  * NFC normalization is idempotent, and pipelines that compose
  * normalization-then-clean stages (e.g. q54-style normalize feeding a
  * normalize-first downstream operator) would otherwise pay the full
  * ICU pass twice per row. Runs in the operatorOptimizationBatch, so
  * the collapse composes with constant folding and projection
  * collapsing.
  */
object SimplifyGraftExpressions extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NormalizeNfc(inner @ NormalizeNfc(_)) => inner
    }
}
