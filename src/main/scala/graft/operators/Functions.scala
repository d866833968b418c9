package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scalar-function surface (SURVEY.md §2.8 F-series, widened): string,
  * datetime, and conditional expression suites plus exact percentiles —
  * each oracle-checked. All are narrow maps over one scan; the functions
  * are Catalyst built-ins, fully inside whole-stage codegen.
  */
object Functions {

  /** String functions over part (F10-style munging): case, slice, pad,
    * regex replace, position. */
  def stringSuite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_partkey",
        upper($"p_brand").as("brand_up"),
        lower($"p_type").as("type_lo"),
        substring($"p_name", 1, 6).as("name6"),
        expr("split_part(p_type, ' ', 1)").as("type_head"),
        regexp_replace($"p_brand", "[0-9]+", "#").as("brand_mask"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        lpad($"p_size".cast("string"), 4, "0").as("size_pad"),
        instr($"p_name", "a").cast("int").as("a_pos"),
        length(trim($"p_name")).cast("int").as("name_len"))
      .orderBy($"p_partkey")
  }

  val stringSuiteOracle: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_up,
      |  lower(p_type) AS type_lo,
      |  substring(p_name, 1, 6) AS name6,
      |  split_part(p_type, ' ', 1) AS type_head,
      |  regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_mask,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  CAST(strpos(p_name, 'a') AS INT) AS a_pos,
      |  CAST(length(trim(p_name)) AS INT) AS name_len
      |FROM part ORDER BY p_partkey""".stripMargin

  /** Datetime functions over orders (F1-F3 family widened). */
  def datetimeSuite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey",
        year($"o_orderdate").cast("int").as("yr"),
        quarter($"o_orderdate").cast("int").as("qtr"),
        month($"o_orderdate").cast("int").as("mon"),
        dayofmonth($"o_orderdate").cast("int").as("dom"),
        (weekday($"o_orderdate") + 1).cast("int").as("isodow"),
        date_format($"o_orderdate" + expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").as("plus30"),
        date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("month_end"),
        datediff($"o_orderdate", to_date(lit("1995-01-01"))).cast("int").as("days_since_95"))
      .orderBy($"o_orderkey")
  }

  val datetimeSuiteOracle: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  CAST(month(o_orderdate) AS INT) AS mon,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(isodow(o_orderdate) AS INT) AS isodow,
      |  strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
      |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT)
      |    AS days_since_95
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Conditional expressions over customer (F11/F12 family): CASE chains,
    * coalesce, nullif, greatest/least, enum-set validation flag. */
  def conditionalSuite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey",
        when($"c_acctbal" < 0, "overdrawn")
          .when($"c_acctbal" < 1000, "low")
          .when($"c_acctbal" < 5000, "mid")
          .otherwise("high").as("bal_band"),
        coalesce(nullif($"c_mktsegment", lit("AUTOMOBILE")), lit("CAR")).as("seg_alias"),
        greatest($"c_acctbal", lit(0.0)).as("bal_floor"),
        least($"c_nationkey", lit(10)).cast("int").as("nk_cap"),
        when($"c_mktsegment".isin("BUILDING", "MACHINERY", "FURNITURE",
          "HOUSEHOLD", "AUTOMOBILE"), 1).otherwise(0).as("seg_valid"))
      .orderBy($"c_custkey")
  }

  val conditionalSuiteOracle: String =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
      |       WHEN c_acctbal < 1000 THEN 'low'
      |       WHEN c_acctbal < 5000 THEN 'mid'
      |       ELSE 'high' END AS bal_band,
      |  coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'CAR') AS seg_alias,
      |  greatest(c_acctbal, 0.0) AS bal_floor,
      |  CAST(least(c_nationkey, 10) AS INT) AS nk_cap,
      |  CAST(CASE WHEN c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE',
      |       'HOUSEHOLD', 'AUTOMOBILE') THEN 1 ELSE 0 END AS INT) AS seg_valid
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** Exact interpolated percentiles per order status (median + p90). */
  def percentiles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90"))
      .orderBy($"o_orderstatus")
  }

  val percentilesOracle: String =
    """SELECT o_orderstatus,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p50,
      |  CAST(round(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(18,8)), 2) AS DOUBLE) AS p90
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Array/higher-order-function parity suite over the token arrays of
    * `documents` — the collection-manipulation surface (slice/sort/
    * filter/transform/flatten/concat/element access) every feature
    * pipeline leans on, exercised as codegen'd built-ins and diffed
    * against DuckDB's list functions. Notes baked into the shape:
    * `array_distinct` ORDER differs cross-engine (first-occurrence vs
    * arbitrary), so only its SIZE is compared; string sorting agrees
    * because both engines sort UTF-8 binary; out-of-range element access
    * is NULL on both. */
  def arraySuite(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = split($"text", " ")
    Tables.documents(s, d)
      .select($"doc_id",
        size(t).cast("long").as("n_tokens"),
        array_join(slice(t, 1, 3), ",").as("first3"),
        array_join(array_sort(slice(t, 1, 5)), ",").as("sorted5"),
        size(array_distinct(t)).cast("long").as("n_distinct"),
        size(filter(t, x => length(x) > 3)).cast("long").as("n_long"),
        array_join(transform(slice(t, 1, 3), x => upper(x)), ",").as("upper3"),
        array_contains(t, "the").cast("int").as("has_the"),
        size(concat(slice(t, 1, 2), slice(t, 3, 2))).cast("long").as("n_cc"),
        element_at(t, 2).as("second"))
      .orderBy($"doc_id")
  }

  val arraySuiteOracle: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(string_split(text, ' '), 1, 3), ',') AS first3,
      |  array_to_string(list_sort(list_slice(string_split(text, ' '), 1, 5)), ',') AS sorted5,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  CAST(len(list_filter(string_split(text, ' '), x -> length(x) > 3)) AS BIGINT) AS n_long,
      |  array_to_string(list_transform(list_slice(string_split(text, ' '), 1, 3),
      |                  x -> upper(x)), ',') AS upper3,
      |  CAST(list_contains(string_split(text, ' '), 'the') AS INT) AS has_the,
      |  CAST(len(list_concat(list_slice(string_split(text, ' '), 1, 2),
      |           list_slice(string_split(text, ' '), 3, 4))) AS BIGINT) AS n_cc,
      |  string_split(text, ' ')[2] AS second
      |FROM documents ORDER BY doc_id""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("fn_string_suite", Some(stringSuiteOracle), stringSuite),
    Q("fn_datetime_suite", Some(datetimeSuiteOracle), datetimeSuite),
    Q("fn_conditional_suite", Some(conditionalSuiteOracle), conditionalSuite),
    Q("fn_array_suite", Some(arraySuiteOracle), arraySuite),
    Q("agg_percentiles", Some(percentilesOracle), percentiles))
}
