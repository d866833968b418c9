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

  /** TPC-H Q8-flavored market share: of all revenue billed to ASIA-region
    * customers per order year, the share supplied by NATION_5 suppliers.
    * 6-way join + conditional aggregation. */
  private val marketShareSql =
    """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
      |  round(CAST(sum(CASE WHEN n2.n_name = 'NATION_5'
      |                      THEN l_extendedprice * (1.0 - l_discount)
      |                      ELSE 0.0 END) /
      |             sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 4)
      |    AS mkt_share
      |FROM customer, orders, lineitem, supplier, nation n1, nation n2, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |  AND s_nationkey = n2.n_nationkey
      |  AND r_name = 'ASIA'
      |GROUP BY CAST(year(o_orderdate) AS INT)
      |ORDER BY o_year""".stripMargin

  def marketShare(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders", "lineitem", "supplier", "nation", "region")
    s.sql(marketShareSql)
  }

  /** TPC-H Q10-flavored: top 20 customers by returned-goods revenue. */
  private val topReturnedSql =
    """SELECT c_custkey, c_name,
      |  round(CAST(sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 2)
      |    AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  def topReturned(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders", "lineitem")
    s.sql(topReturnedSql)
  }

  /** first_value / last_value / ntile — the remaining window-function
    * family, with fully-deterministic frame ordering.
    *
    * The first/last window is PARTITIONED (by o_custkey) and scales as-is;
    * the naive `ntile(4) OVER (ORDER BY …)` does NOT — an unpartitioned
    * window is `Exchange SinglePartition` + a whole-table single-task sort.
    * The Spark side instead derives the quartile from a distributed global
    * row number (range buckets + broadcast offsets — [[RankStats]]); the
    * oracle keeps the standard SQL form. */
  private val winFirstLastSql =
    """SELECT o_orderkey,
      |  first_value(o_orderkey) OVER w AS first_order,
      |  last_value(o_orderkey) OVER w AS last_order,
      |  CAST(ntile(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT)
      |    AS price_quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  def winFirstLast(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val o = Tables.load(s, d, "orders")
    val quartile = RankStats.withGlobalRowNumber(
        o.select($"o_orderkey", $"o_totalprice"),
        "o_totalprice", asc = false, tieCols = Seq("o_orderkey"))
      .select($"o_orderkey",
        RankStats.ntileFromRowNumber($"__rn", $"__n", 4).cast("int")
          .as("price_quartile"))
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .withColumn("first_order", first($"o_orderkey").over(w))
      .withColumn("last_order", last($"o_orderkey").over(w))
      .join(quartile, "o_orderkey")
      .select($"o_orderkey", $"first_order", $"last_order", $"price_quartile")
      .orderBy($"o_orderkey")
  }

  /** percent_rank / cume_dist — rank statistics whose values depend only on
    * the ordering VALUES (ties collapse), so they are deterministic without
    * a tiebreak in the window order.
    *
    * Spark side: distributed rank counts ([[RankStats.withRankCounts]] —
    * range buckets + broadcast offsets + per-bucket windows), NOT a global
    * unpartitioned window, which would single-task-sort the table.
    * percent_rank = lt/(n-1), cume_dist = le/n — the exact SQL-standard
    * definitions. */
  private val winRankStatsSql =
    """SELECT o_orderkey,
      |  round(percent_rank() OVER (ORDER BY o_totalprice), 6) AS pct_rank,
      |  round(cume_dist() OVER (ORDER BY o_totalprice), 6) AS cume
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def winRankStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    RankStats.withRankCounts(
        Tables.load(s, d, "orders").select($"o_orderkey", $"o_totalprice"),
        "o_totalprice")
      .select($"o_orderkey",
        round($"__lt" / ($"__n" - 1), 6).as("pct_rank"),
        round($"__le" / $"__n", 6).as("cume"))
      .orderBy($"o_orderkey")
  }

  /** Math scalar suite — byte-identical SQL on both engines. */
  private val mathSuiteSql =
    """SELECT o_orderkey,
      |  round(sqrt(o_totalprice), 6) AS sq,
      |  round(ln(o_totalprice), 6) AS lg,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS cl,
      |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
      |  round(power(o_totalprice, 0.25), 6) AS pw,
      |  CAST(CAST(floor(o_totalprice) AS BIGINT) % 97 AS BIGINT) AS md
      |FROM orders ORDER BY o_orderkey""".stripMargin

  def mathSuite(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders")
    s.sql(mathSuiteSql)
  }

  /** Boolean aggregates per group — byte-identical on both engines. */
  private val boolAggSql =
    """SELECT l_returnflag,
      |  bool_and(l_quantity >= 1.0) AS all_qty_positive,
      |  bool_or(l_discount > 0.08) AS any_deep_discount,
      |  CAST(count(CASE WHEN l_tax = 0.0 THEN 1 END) AS BIGINT) AS tax_free_lines
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def boolAgg(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql(boolAggSql)
  }

  /** Bitwise operations — byte-identical on both engines. */
  private val bitSuiteSql =
    """SELECT p_partkey,
      |  CAST(p_size & 15 AS INT) AS lo_nibble,
      |  CAST(p_size | 64 AS INT) AS with_flag,
      |  CAST(~p_size AS INT) AS inverted,
      |  CAST(p_size << 2 AS INT) AS shifted
      |FROM part ORDER BY p_partkey""".stripMargin

  def bitSuite(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "part")
    s.sql(bitSuiteSql)
  }

  /** TPC-H Q2-shape: correlated scalar MIN subquery — for every part, the
    * suppliers that shipped it at its minimum observed price (the testdata
    * star schema has no partsupp table; lineitem is the part×supplier price
    * relation). Exercises Catalyst's RewriteCorrelatedScalarSubquery: the
    * correlated `= (SELECT min ...)` decorrelates into an aggregate +
    * join, NOT per-row re-execution — at 100 TB one extra shuffle on
    * l_partkey, no N+1 scans. Byte-identical SQL on both engines; DISTINCT
    * makes (min_price, p_partkey, s_name) a total order before LIMIT. */
  private val minCostSupplierSql =
    """SELECT DISTINCT p_partkey, p_name, s_name,
      |       round(l_extendedprice, 2) AS min_price
      |FROM part, lineitem, supplier
      |WHERE l_partkey = p_partkey AND s_suppkey = l_suppkey
      |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
      |                         FROM lineitem l2
      |                         WHERE l2.l_partkey = p_partkey)
      |ORDER BY min_price, p_partkey, s_name
      |LIMIT 100""".stripMargin

  def minCostSupplier(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "part", "lineitem", "supplier")
    s.sql(minCostSupplierSql)
  }

  /** TPC-H Q18-shape: large-volume orders — IN over a grouped HAVING
    * subquery, then a re-aggregation of the surviving orders. Catalyst
    * plans the HAVING subquery as an aggregate + left-semi join on the
    * order key (two shuffles total at any scale); the oracle keeps the
    * identical text. o_orderdate stays in GROUP BY but out of the
    * projection (timestamp rendering differs across engines). */
  private val bigOrdersSql =
    """SELECT c_name, c_custkey, o_orderkey,
      |       round(o_totalprice, 2) AS total_price,
      |       round(sum(l_quantity), 2) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY total_price DESC, o_orderkey
      |LIMIT 100""".stripMargin

  def bigOrders(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders", "lineitem")
    s.sql(bigOrdersSql)
  }

  /** TPC-H Q21-shape: EXISTS + NOT EXISTS on one fact table — suppliers
    * who were the sole 'R'-flagged supplier on a finished multi-supplier
    * order. Exercises the decorrelation pair no other query hits: the
    * EXISTS becomes a left-semi join and the NOT EXISTS a left-anti join,
    * both shuffled once on l_orderkey (the reference surface has no
    * subqueries at all — SURVEY §2.5). */
  private val soleReturnSupplierSql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  def soleReturnSupplier(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "supplier", "lineitem", "orders")
    s.sql(soleReturnSupplierSql)
  }

  /** TPC-H Q19-shape: disjunctive multi-predicate join — three OR'd
    * conjunction groups mixing part and lineitem predicates. Exercises the
    * predicate path no other query hits: Catalyst must extract the common
    * `p_partkey = l_partkey` join condition from under the OR (CNF
    * conversion) and push the per-relation disjuncts into both scans —
    * without that, this plans as a cartesian filter. At 100 TB the pushed
    * disjunction prunes row groups on both sides before the join. */
  private val brandBucketRevenueSql =
    """SELECT round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                     (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0
      |             AS DOUBLE), 2) AS revenue,
      |       CAST(count(*) AS BIGINT) AS n_items
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
      |    OR (p_brand = 'Brand#12' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
      |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50))""".stripMargin

  def brandBucketRevenue(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "part")
    s.sql(brandBucketRevenueSql)
  }

  /** TPC-H Q22-shape: scalar AVG subquery + correlated NOT EXISTS — the
    * "global customers with positive balances and no urgent orders"
    * report. Two decorrelations in one plan: the scalar average becomes a
    * broadcast single-row join; the NOT EXISTS a left-anti join on the
    * customer key (c_nationkey stands in for Q22's phone country code —
    * the schema has no phone column). */
  private val idleRichCustomersSql =
    """SELECT c_nationkey,
      |       CAST(count(*) AS BIGINT) AS numcust,
      |       round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS totacctbal
      |FROM customer c
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  def idleRichCustomers(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders")
    s.sql(idleRichCustomersSql)
  }

  // -------------------------------------------------------------------
  // Remaining TPC-H query shapes (Q4/Q6/Q9/Q11/Q12/Q13/Q15/Q16/Q17/Q20),
  // adapted to the testdata star schema (no partsupp table, no
  // commit/receipt dates or ship modes — the JOIN/subquery/decorrelation
  // shape of each query is what is preserved). SQL is byte-identical on
  // both engines.
  // -------------------------------------------------------------------

  /** Q4 shape: date-windowed EXISTS semi-join counted per priority. */
  private val q4PriorityCountSql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  def q4PriorityCount(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders", "lineitem")
    s.sql(q4PriorityCountSql)
  }

  /** Q6 shape: single-table multi-predicate forecast-revenue aggregate —
    * every predicate reaches the parquet scan as a pushed filter. */
  private val q6ForecastRevenueSql =
    """SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 25.0""".stripMargin

  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql(q6ForecastRevenueSql)
  }

  /** Q9 shape: five-table join with revenue by (nation, order year).
    * Revenue uses the exact-integer-cents idiom (see Relational.q7): at
    * sf0.01 two of 175 groups landed on a cent boundary and plain
    * double-sum rounding flipped differently per engine. floor((u+50) /
    * 100.0) is the dialect-portable half-up integer division — exact
    * because multiples of 100 are exactly representable and non-multiples
    * sit ≥ 1/100 from the floor boundary. */
  private val q9NationYearRevenueSql =
    """SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
      |       CAST(floor((sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
      |                       CAST(round((1.0 - l_discount) * 100) AS BIGINT)) + 50)
      |                  / 100.0) AS DOUBLE) / 100 AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN part ON l_partkey = p_partkey
      |WHERE p_name LIKE '%gear%'
      |GROUP BY n_name, CAST(year(o_orderdate) AS INT)
      |ORDER BY n_name, o_year""".stripMargin

  def q9NationYearRevenue(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "orders", "supplier", "nation", "part")
    s.sql(q9NationYearRevenueSql)
  }

  /** Q11 shape: HAVING against a scalar fraction of the same aggregate
    * over the whole table (the CTE is evaluated once, not per group). */
  private val q11ImportantSuppliersSql =
    """WITH sup_value AS (
      |  SELECT l_suppkey, sum(l_extendedprice * (1.0 - l_discount)) AS value
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT l_suppkey, round(CAST(value AS DOUBLE), 2) AS value
      |FROM sup_value
      |WHERE value > (SELECT sum(value) * 0.011 FROM sup_value)
      |ORDER BY l_suppkey""".stripMargin

  def q11ImportantSuppliers(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem")
    s.sql(q11ImportantSuppliersSql)
  }

  /** Q12 shape: join + conditional two-way counts per group. */
  private val q12PriorityShippingSql =
    """SELECT l_returnflag,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  def q12PriorityShipping(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "orders", "lineitem")
    s.sql(q12PriorityShippingSql)
  }

  /** Q13 shape: LEFT OUTER join + two-level aggregation (order-count
    * distribution over customers, including zero-order customers). */
  private val q13CustomerDistributionSql =
    """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
      |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  def q13CustomerDistribution(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "customer", "orders")
    s.sql(q13CustomerDistributionSql)
  }

  /** Q15 shape: CTE reused twice — top supplier(s) by windowed revenue
    * vs the max over the same CTE. Revenue is rounded INSIDE the CTE so
    * the cross-engine equality on the max is over already-stabilized
    * values. */
  private val q15TopSupplierSql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(CAST(sum(l_extendedprice * (1.0 - l_discount)) AS DOUBLE), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "supplier", "lineitem")
    s.sql(q15TopSupplierSql)
  }

  /** Q16 shape: NOT IN anti-join + count(DISTINCT) per group. */
  private val q16SupplierCountSql =
    """SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_type LIKE 'SMALL%'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  def q16SupplierCount(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "part", "supplier")
    s.sql(q16SupplierCountSql)
  }

  /** Q17 shape: correlated scalar-average subquery against the outer
    * row's part — decorrelates to an aggregate + join, never per-row
    * re-execution. */
  private val q17SmallQuantityRevenueSql =
    """SELECT round(CAST(sum(l_extendedprice) / 7.0 AS DOUBLE), 2) AS avg_yearly
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_brand = 'Brand#1'
      |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      |                    WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin

  def q17SmallQuantityRevenue(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "lineitem", "part")
    s.sql(q17SmallQuantityRevenueSql)
  }

  /** Q20 shape: IN-chain semi-joins with a scalar-subquery HAVING — the
    * quantity threshold is RELATIVE (1.1× the mean per-supplier total) so
    * selectivity is scale-factor-free. */
  private val q20ExcessSuppliersSql =
    """SELECT s_name, s_acctbal
      |FROM supplier
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM lineitem
      |  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |  GROUP BY l_suppkey
      |  HAVING sum(l_quantity) > (
      |    SELECT 1.1 * avg(q) FROM (
      |      SELECT sum(l_quantity) AS q FROM lineitem
      |      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |      GROUP BY l_suppkey) totals))
      |ORDER BY s_name""".stripMargin

  def q20ExcessSuppliers(s: SparkSession, d: String): DataFrame = {
    withViews(s, d, "supplier", "lineitem", "part")
    s.sql(q20ExcessSuppliersSql)
  }

  val defs: Seq[Q] = Seq(
    Q("sql_q4_priority_count", Some(q4PriorityCountSql), q4PriorityCount),
    Q("sql_q6_forecast_revenue", Some(q6ForecastRevenueSql), q6ForecastRevenue),
    Q("sql_q9_nation_year_revenue", Some(q9NationYearRevenueSql), q9NationYearRevenue),
    Q("sql_q11_important_suppliers", Some(q11ImportantSuppliersSql), q11ImportantSuppliers),
    Q("sql_q12_priority_shipping", Some(q12PriorityShippingSql), q12PriorityShipping),
    Q("sql_q13_customer_distribution", Some(q13CustomerDistributionSql), q13CustomerDistribution),
    Q("sql_q15_top_supplier", Some(q15TopSupplierSql), q15TopSupplier),
    Q("sql_q16_supplier_count", Some(q16SupplierCountSql), q16SupplierCount),
    Q("sql_q17_small_quantity_revenue", Some(q17SmallQuantityRevenueSql), q17SmallQuantityRevenue),
    Q("sql_q20_excess_suppliers", Some(q20ExcessSuppliersSql), q20ExcessSuppliers),
    Q("sql_bool_agg", Some(boolAggSql), boolAgg),
    Q("sql_bit_suite", Some(bitSuiteSql), bitSuite),
    Q("sql_win_rank_stats", Some(winRankStatsSql), winRankStats),
    Q("fn_math_suite", Some(mathSuiteSql), mathSuite),
    Q("sql_win_first_last", Some(winFirstLastSql), winFirstLast),
    Q("sql_market_share", Some(marketShareSql), marketShare),
    Q("sql_top_returned_customers", Some(topReturnedSql), topReturned),
    Q("sql_grouping_sets", Some(groupingSetsSql), groupingSets),
    Q("sql_scalar_subquery", Some(scalarSubquerySql), scalarSubquery),
    Q("sql_in_subquery", Some(inSubquerySql), inSubquery),
    Q("sql_correlated_subquery", Some(correlatedSql), correlatedSubquery),
    Q("sql_min_cost_supplier", Some(minCostSupplierSql), minCostSupplier),
    Q("sql_big_orders", Some(bigOrdersSql), bigOrders),
    Q("sql_sole_return_supplier", Some(soleReturnSupplierSql), soleReturnSupplier),
    Q("sql_brand_bucket_revenue", Some(brandBucketRevenueSql), brandBucketRevenue),
    Q("sql_idle_rich_customers", Some(idleRichCustomersSql), idleRichCustomers))
}
