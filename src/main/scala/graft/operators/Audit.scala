package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declarative data-quality audit — the constraint-verification pass
  * (completeness / uniqueness / enum compliance / range checks) a
  * production pipeline runs on every ingested partition before letting it
  * into the warehouse. Same contract as the published Deequ/
  * great-expectations model: a constraint suite evaluates to one metric
  * row per constraint plus a pass/fail verdict.
  *
  * Scale shape: the whole suite is ONE aggregation pass over the table —
  * every metric is algebraic (count / conditional count / min / max /
  * approx-or-exact distinct), so it map-side combines and the driver
  * receives a single row which is then unpivoted to the per-constraint
  * report. Nothing here is per-constraint scans: adding a constraint adds
  * a column to the same agg, not a pass over 100 TB.
  */
object Audit {

  /** Constraint suite over `orders`: completeness, key uniqueness, value
    * compliance, enum containment, and a min-range check. Output is one
    * row per constraint: (constraint, metric 4-dp, passed). */
  def auditOrders(s: SparkSession, d: String): DataFrame =
    auditOf(Tables.orders(s, d))

  /** The suite against any orders-shaped relation (spec entry point for
    * violation fixtures). */
  def auditOf(orders: DataFrame): DataFrame = {
    val s = orders.sparkSession
    import s.implicits._
    val m = orders.agg(
      count(lit(1)).as("n"),
      count($"o_custkey").as("nonnull_cust"),
      countDistinct($"o_orderkey").as("dist_key"),
      sum(when($"o_totalprice" > 0, 1L).otherwise(0L)).as("pos_price"),
      sum(when($"o_orderstatus".isin("O", "F", "P"), 1L).otherwise(0L)).as("valid_status"),
      min($"o_totalprice").as("min_price"))
    // One driver row in, |constraints| rows out: stack() is the unpivot.
    // ("constraint" is a reserved word in ANSI/DuckDB — hence check_name.)
    m.select(expr(
      """stack(5,
        |  'completeness_o_custkey',      round(nonnull_cust / n, 4),  nonnull_cust = n,
        |  'uniqueness_o_orderkey',       round(dist_key / n, 4),      dist_key = n,
        |  'compliance_positive_price',   round(pos_price / n, 4),     pos_price = n,
        |  'compliance_status_enum',      round(valid_status / n, 4),  valid_status = n,
        |  'min_o_totalprice',            round(min_price, 4),         min_price > 0.0
        |) AS (check_name, metric, passed)""".stripMargin))
      .select($"check_name", $"metric".cast("double").as("metric"), $"passed")
      .orderBy($"check_name")
  }

  val auditOrdersOracle: String =
    """WITH m AS (
      |  SELECT count(*) AS n,
      |         count(o_custkey) AS nonnull_cust,
      |         count(DISTINCT o_orderkey) AS dist_key,
      |         sum(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS pos_price,
      |         sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS valid_status,
      |         min(o_totalprice) AS min_price
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'completeness_o_custkey' AS check_name,
      |         CAST(round(nonnull_cust * 1.0 / n, 4) AS DOUBLE) AS metric,
      |         nonnull_cust = n AS passed FROM m
      |  UNION ALL SELECT 'uniqueness_o_orderkey',
      |         CAST(round(dist_key * 1.0 / n, 4) AS DOUBLE), dist_key = n FROM m
      |  UNION ALL SELECT 'compliance_positive_price',
      |         CAST(round(pos_price * 1.0 / n, 4) AS DOUBLE), pos_price = n FROM m
      |  UNION ALL SELECT 'compliance_status_enum',
      |         CAST(round(valid_status * 1.0 / n, 4) AS DOUBLE), valid_status = n FROM m
      |  UNION ALL SELECT 'min_o_totalprice',
      |         CAST(round(min_price, 4) AS DOUBLE), min_price > 0.0 FROM m)
      |ORDER BY check_name""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("audit_orders_constraints", Some(auditOrdersOracle), auditOrders))
}
