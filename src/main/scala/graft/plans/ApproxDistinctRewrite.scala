package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: with the user's explicit consent, exact single-column
  * `count(DISTINCT x)` aggregates are rewritten to HyperLogLog++ sketches.
  *
  * Why: an exact distinct count is one of the most expensive aggregate
  * shapes on a 100 TB table — Spark plans it as an Expand (one extra row
  * per distinct-aggregate per input row) plus a two-stage hash aggregate
  * whose first stage state is proportional to the number of DISTINCT
  * values per partition. HLL++ replaces that with bounded sketch state
  * (~few KB per group at the default 5% relative error), map-side
  * combined like any algebraic aggregate — the standard interactive-BI
  * trade (Druid/Presto `approx_distinct`) expressed as a Catalyst rule,
  * so user queries keep their natural `count(DISTINCT ...)` form.
  *
  * Consent model: fires ONLY while `spark.graft.approxDistinct.enabled`
  * is true — approximation silently changing results is never acceptable
  * as a default, so the default is off and the flag is the explicit,
  * session-scoped opt-in (the engine's registered oracle queries all run
  * with it off). Multi-column distinct counts and distinct aggregates
  * other than COUNT are left untouched; null semantics are preserved
  * (both Count-distinct and HLL++ ignore nulls). The rewrite keeps the
  * enclosing Alias/AggregateExpression ids, so downstream references
  * resolve unchanged.
  *
  * Registration: [[GraftExtensions]] (config-based) or [[install]] on a
  * live session (wired into GraftFunctions.register like
  * [[EditDistancePrefilter]]).
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val Flag = "spark.graft.approxDistinct.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(Flag, "false").toBoolean) plan
    else plan.transform {
      case a: Aggregate =>
        a.transformExpressions {
          case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
            ae.copy(
              aggregateFunction = HyperLogLogPlusPlus(child),
              isDistinct = false)
        }
    }

  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}
