package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** A production guardrail as an OPTIMIZER RULE (not just a test): any
  * condition-less inner/cross join whose sides are both un-hinted is
  * refused at planning time with an actionable message, instead of
  * detonating as an O(|L|·|R|) CartesianProduct three hours into a
  * 100 TB job. The test-suite twin (`PlanGuardrailSpec`) protects THIS
  * repo's queries; this rule ships the same protection to library
  * users' own queries, wired through the standard extension point
  * ([[graft.functions.GraftExtensions]] §injectOptimizerRule — the
  * same jar works via `--conf spark.sql.extensions=`).
  *
  * Escapes, in order of preference:
  *  - `broadcast(smallSide)` — the compose every bounded 1-row /
  *    dimension crossJoin should use anyway (becomes a broadcast
  *    nested-loop join, which this rule deliberately allows);
  *  - `SET spark.graft.allowCartesian=true` — the explicit, audited
  *    opt-in for a knowingly bounded cartesian.
  *
  * The rule is a pure structural CHECK — it transforms nothing, so it
  * cannot perturb plans, and idempotency (batch re-runs) is trivial. */
case class CartesianGuard(spark: SparkSession) extends Rule[LogicalPlan] {

  private def hinted(h: HintInfo): Boolean = h.strategy.isDefined

  /** A side Catalyst can PROVE is at most one row (grouping-less
    * Aggregate, LIMIT 1, single-row LocalRelation…) makes the
    * condition-less join a bounded enrich, not a cartesian blow-up —
    * the planner turns it into a broadcast nested-loop regardless of
    * hints. Exempting it keeps the guard deployable over this
    * library's own registry, where scalar-aggregate composes
    * (`df.crossJoin(df.agg(...))`) are a standard idiom. */
  private def provablyTiny(p: LogicalPlan): Boolean =
    p.maxRows.exists(_ <= 1L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val allow = spark.conf
      .getOption("spark.graft.allowCartesian").contains("true")
    if (!allow) plan.foreach {
      case j: Join if j.condition.isEmpty &&
        (j.joinType == Cross || j.joinType == Inner) &&
        !j.hint.leftHint.exists(hinted) &&
        !j.hint.rightHint.exists(hinted) &&
        !provablyTiny(j.left) && !provablyTiny(j.right) =>
        throw new IllegalStateException(
          "graft.CartesianGuard: condition-less " + j.joinType +
            " join with no broadcast hint would plan a CartesianProduct" +
            " (O(|left|*|right|) at scale). broadcast() the bounded" +
            " side, or SET spark.graft.allowCartesian=true to opt in.")
      case _ => ()
    }
    plan
  }
}
