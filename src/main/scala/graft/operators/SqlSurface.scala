package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The engine's SQL entry point: the same parquet tables queried through
  * `spark.sql` — grouping sets and the subquery family (scalar, IN,
  * correlated EXISTS/aggregate). Catalyst rewrites every subquery into a
  * join (decorrelation → left outer / semi joins), so these plans scale
  * exactly like the hand-built join queries — no per-row re-execution,
  * unlike a naive interpreter.
  *
  * The oracle SQL is byte-identical to the executed Spark SQL wherever the
  * dialects agree — the strongest possible differential check.
  */
object SqlSurface {

  private def withViews(s: SparkSession, d: String, tables: String*): Unit =
    tables.foreach(t => Tables.load(s, d, t).createOrReplaceTempView(t))

  private val groupingSetsSql =
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |       coalesce(l_linestatus, 'ALL') AS ls,
      |       CAST(count(*) AS BIGINT) AS cnt,
      |       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  def groupingSets(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql(groupingSetsSql)
  }

  private val scalarSubquerySql =
    """SELECT o_orderkey,
      |       round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 2)
      |         AS diff_from_avg
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql(scalarSubquerySql)
  }

  private val inSubquerySql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_nationkey IN (
      |  SELECT n_nationkey FROM nation
      |  WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'ASIA'))
      |ORDER BY c_custkey""".stripMargin

  def inSubquery(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "nation", "region")
    s.sql(inSubquerySql)
  }

  private val correlatedSql =
    """SELECT o.o_orderkey FROM orders o
      |WHERE o.o_totalprice > (
      |  SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
      |  WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql(correlatedSql)
  }

  val defs: Seq[Q] = Seq(
    Q("sql_grouping_sets", Some(groupingSetsSql), groupingSets),
    Q("sql_scalar_subquery", Some(scalarSubquerySql), scalarSubquery),
    Q("sql_in_subquery", Some(inSubquerySql), inSubquery),
    Q("sql_correlated_subquery", Some(correlatedSql), correlatedSubquery))
}
