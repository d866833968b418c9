package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: bounded-edit-distance predicates are rewritten into
  * their cheap, early-exiting form.
  *
  *   levenshtein(a, b) <= k      [k literal]
  * becomes
  *   abs(length(a) - length(b)) <= k          -- O(1) guard: a length gap
  *                                            -- > k already implies d > k
  *   AND levenshtein(a, b, k) >= 0            -- banded DP: O(k·min(n,m))
  *                                            -- instead of O(n·m), exits
  *                                            -- the row as soon as the
  *                                            -- band exceeds k
  *
  * The thresholded `Levenshtein` (public Spark expression, 3.5+) returns
  * -1 when the distance exceeds the threshold and the true distance
  * (which is then necessarily <= k) otherwise — so `>= 0` is the complete
  * rewritten predicate. A naive hand-rewrite to `levenshtein(a,b,k) <= k`
  * is the latent bug (-1 satisfies it); EditDistancePrefilterSpec pins
  * the trap with a same-length pair whose distance exceeds k.
  *
  * Why a Rule[LogicalPlan] and not a smarter operator: the predicate is
  * what users naturally write (and what [[graft.operators.EntityRes]]
  * writes); the speedup is mechanical and semantics-preserving, i.e.
  * exactly an optimizer's job. The rule is idempotent by construction —
  * it only fires on UN-thresholded Levenshtein (`threshold.isEmpty`),
  * and its own rewrite is thresholded.
  *
  * Registration: [[GraftExtensions]] for config-based deployment
  * (`spark.sql.extensions=graft.plans.GraftExtensions`), or
  * [[EditDistancePrefilter.install]] on a live session (used by
  * [[graft.functions.GraftFunctions.register]], so every graft session
  * gets it).
  */
object EditDistancePrefilter extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      f.copy(condition = rewrite(cond))
    case j: Join if j.condition.isDefined =>
      j.copy(condition = j.condition.map(rewrite))
  }

  private def rewrite(cond: Expression): Expression = cond.transform {
    case LessThanOrEqual(lev @ Levenshtein(a, b, None), k @ Literal(_, IntegerType)) =>
      banded(a, b, k)
    case GreaterThanOrEqual(k @ Literal(_, IntegerType), lev @ Levenshtein(a, b, None)) =>
      banded(a, b, k)
    case LessThan(lev @ Levenshtein(a, b, None), k @ Literal(v: Int, IntegerType)) if v > 0 =>
      // d < k  ⟺  d <= k-1 (distances are integers)
      banded(a, b, Literal(v - 1, IntegerType))
  }

  private def banded(a: Expression, b: Expression, k: Literal): Expression = {
    val lengthGap = LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)
    // `>= 0` is the COMPLETE predicate: the thresholded expression returns
    // either a distance that is already <= k, or -1. A `<= k` conjunct
    // would be dead code that re-evaluates the band walk per row.
    And(lengthGap, GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0, IntegerType)))
  }

  /** Idempotently add the rule to a live session's optimizer. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(this))
      spark.experimental.extraOptimizations = cur :+ this
  }
}

/** `spark.sql.extensions` entry point — the production deployment route
  * (cluster-wide config, no code changes in user jobs). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EditDistancePrefilter)
    e.injectOptimizerRule(_ => ApproxDistinctRewrite)
  }
}
