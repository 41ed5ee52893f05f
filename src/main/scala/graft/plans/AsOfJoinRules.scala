package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom operator (SURVEY.md §4b path (c),
  * completing the Rule[LogicalPlan] surface): Catalyst's own
  * PushDownPredicates cannot see through an unknown binary node, so a
  * Filter above AsOfJoinNode would otherwise evaluate after the join
  * and the parquet scan would read everything. Left-side-only
  * conjuncts are safe to push: every output row corresponds to exactly
  * one left row and the pushdown cannot change any row's right-side
  * match (matches depend only on that left row's key/time). Pushed
  * filters land directly above the left subplan, where
  * FileSourceStrategy then turns them into parquet PushedFilters.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {
  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, join: AsOfJoinNode) =>
      val (leftOnly, rest) = splitConjuncts(cond)
        .partition(c => c.deterministic && c.references.subsetOf(join.left.outputSet))
      if (leftOnly.isEmpty) f
      else {
        val pushed = join.copy(left = Filter(leftOnly.reduce(And), join.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
