package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, ApproximatePercentile, Percentile, PercentileDisc}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/**
 * Optimizer rule: route exact `percentile` aggregates to the
 * bounded-state `approx_percentile` sketch when the session opts in
 * with `spark.graft.quantiles.approx=true` (sketch accuracy via
 * `spark.graft.quantiles.accuracy`, default 10000 → rank error
 * ≤ n/10000).
 *
 * Why a RULE and not a code change: the exact `Percentile` aggregate
 * buffers every group value in the reducer — a single hot group at
 * 100 TB holds ~10⁹ doubles on one task (the documented scale hazard of
 * `quantiles_lineitem`). Pipelines want the sketch by default, but
 * correctness gates and small ad-hoc sessions want the exact form. A
 * session-scoped optimizer rule routes WITHOUT rewriting queries:
 * notebooks, saved jobs and SQL strings all pick up the policy from
 * the session config, and the gate keeps exact semantics simply by not
 * setting the flag. This is the idiomatic Spark shape for an
 * engine-level execution policy — the same mechanism AQE uses to
 * re-plan joins.
 *
 * Safety: only fires on unweighted (`frequency = 1`), non-reversed,
 * DOUBLE-typed percentiles — exactly the cases where
 * `approx_percentile` has the same result type and argument semantics,
 * so the rewrite can never change the plan's schema.
 *
 * Coverage: `percentile(...)` AND both ANSI ordered-set forms.
 * `percentile_cont WITHIN GROUP` lowers to the same exact `Percentile`
 * aggregate before the optimizer runs, so the first case already
 * routes it; `percentile_disc` keeps its own aggregate and gets its
 * own case — the sketch returns an actual element at approximately the
 * requested rank, which is percentile_disc's semantics up to sketch
 * rank error.
 */
case class QuantileRouting(spark: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    spark.conf.getOption("spark.graft.quantiles.approx").contains("true")

  private def accuracy: Long =
    spark.conf.getOption("spark.graft.quantiles.accuracy")
      .map(_.toLong).getOrElse(10000L)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transformAllExpressions {
      case ae @ AggregateExpression(p: Percentile, _, false, None, _)
          if p.frequencyExpression == Literal(1L) && !p.reverse &&
            p.child.dataType == DoubleType =>
        ae.copy(aggregateFunction = new ApproximatePercentile(
          p.child, p.percentageExpression, Literal(accuracy.toInt)))
      case ae @ AggregateExpression(p: PercentileDisc, _, false, None, _)
          if !p.reverse && p.child.dataType == DoubleType =>
        ae.copy(aggregateFunction = new ApproximatePercentile(
          p.child, p.percentageExpression, Literal(accuracy.toInt)))
    }
}
