package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Q

/** Interchange-format sources/sinks beyond parquet: CSV, JSON lines, and
  * ORC, exercised as full write→read round-trips whose results are
  * oracle-checked against the parquet originals — i.e. the check proves
  * the sink and the source preserve values exactly, not just that the
  * files appear.
  *
  * Spark-first notes:
  *  - Text formats (CSV/JSON) serialize doubles via shortest-round-trip
  *    `Double.toString`, so numeric round-trips are bit-exact; both
  *    readers get EXPLICIT schemas — schema inference over 100 TB of text
  *    is a full extra pass and is never acceptable at scale.
  *  - CSV/JSON are row formats: Spark does push filters into the text
  *    scans, but a pushed filter there only skips rows AFTER parsing the
  *    line — every byte is still read and tokenized, and there are no
  *    column statistics to skip whole chunks with. At scale they are
  *    INGEST formats: land them, convert once to parquet/ORC (columnar
  *    row-group statistics → real IO skipping), query the columnar copy.
  *  - ORC is columnar with stripe-level statistics pushdown (FormatsSpec
  *    asserts PushedFilters on its scan), the one non-parquet format you
  *    might actually query in place.
  *
  * Each round-trip materializes once per (sf, format) into a temp dir
  * (the [[graft.operators.Similarity]] index-memo idiom).
  */
object Formats {

  /** Materialized round-trip dir, if this session already built one
    * (spec hook for raw re-reads). */
  private[sources] def dirFor(s: SparkSession, d: String, fmt: String): Option[String] =
    graft.operators.SessionCaches.peekDir(s, s"format-rt:$d:$fmt")

  private def roundtripDir(s: SparkSession, d: String, fmt: String,
                           write: (DataFrame, String) => Unit,
                           src: DataFrame): String =
    graft.operators.SessionCaches.dirMemo(s, s"format-rt:$d:$fmt")(
      path => write(src, path))

  // The catalog schema, not a local copy — a drifted duplicate (e.g.
  // c_nationkey long vs the catalog's int) would silently type the
  // round-tripped relation differently from every other customer path.
  private val customerSchema = Tables.customerSchema

  /** CSV round-trip: customer → headered CSV → explicit-schema read →
    * per-segment balance profile. Values must survive the text round-trip
    * exactly for the oracle (which reads the parquet original) to match. */
  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = roundtripDir(s, d, "csv",
      (df, p) => df.write.mode("overwrite").option("header", "true").csv(p),
      Tables.customer(s, d))
    s.read.schema(customerSchema).option("header", "true").csv(dir)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"c_acctbal".cast("decimal(28,8)")).cast("double"), 2).as("total_bal"),
        round(min($"c_acctbal"), 2).as("min_bal"),
        round(max($"c_acctbal"), 2).as("max_bal"))
      .orderBy($"c_mktsegment")
  }

  private val segmentProfileSql =
    """SELECT c_mktsegment,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(round(CAST(sum(CAST(c_acctbal AS DECIMAL(28,8))) AS DOUBLE), 2) AS DOUBLE) AS total_bal,
      |       CAST(round(min(c_acctbal), 2) AS DOUBLE) AS min_bal,
      |       CAST(round(max(c_acctbal), 2) AS DOUBLE) AS max_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** JSON-lines round-trip: same customer profile through `.json`. */
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = roundtripDir(s, d, "json",
      (df, p) => df.write.mode("overwrite").json(p),
      Tables.customer(s, d))
    s.read.schema(customerSchema).json(dir)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"c_acctbal".cast("decimal(28,8)")).cast("double"), 2).as("total_bal"),
        round(min($"c_acctbal"), 2).as("min_bal"),
        round(max($"c_acctbal"), 2).as("max_bal"))
      .orderBy($"c_mktsegment")
  }

  /** ORC round-trip: orders → ORC → filtered aggregate. ORC is columnar,
    * so unlike the text formats this scan does take pushed filters. */
  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = roundtripDir(s, d, "orc",
      (df, p) => df.write.mode("overwrite").orc(p),
      Tables.orders(s, d))
    s.read.orc(dir)
      .filter($"o_totalprice" > 100000.0)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice".cast("decimal(28,8)")).cast("double"), 2).as("revenue"))
      .orderBy($"o_orderstatus")
  }

  /** XML round-trip: customer → XML (one `<customer>` element per row)
    * → explicit-schema read → the same per-segment profile. XML is the
    * third text ingest format, native in Spark 4 (the spark-xml data
    * source was merged upstream): like CSV/JSON it serializes doubles
    * shortest-round-trip so values survive exactly, and like them it
    * parses every byte with no column statistics — land it, convert to
    * parquet, query the columnar copy. `rowTag` is mandatory on read;
    * schema inference over 100 TB of XML would be a full extra pass, so
    * the reader gets the catalog schema explicitly. */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = roundtripDir(s, d, "xml",
      (df, p) => df.write.mode("overwrite").option("rowTag", "customer")
        .option("rootTag", "customers").xml(p),
      Tables.customer(s, d))
    s.read.schema(customerSchema).option("rowTag", "customer").xml(dir)
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n"),
        round(sum($"c_acctbal".cast("decimal(28,8)")).cast("double"), 2).as("total_bal"),
        round(min($"c_acctbal"), 2).as("min_bal"),
        round(max($"c_acctbal"), 2).as("max_bal"))
      .orderBy($"c_mktsegment")
  }

  val orcRoundtripOracle: String =
    """SELECT o_orderstatus,
      |       CAST(count(*) AS BIGINT) AS n,
      |       CAST(round(CAST(sum(CAST(o_totalprice AS DECIMAL(28,8))) AS DOUBLE), 2) AS DOUBLE) AS revenue
      |FROM orders WHERE o_totalprice > 100000.0
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Parquet AGGREGATE pushdown — the metadata-only answer path: with
    * `spark.sql.parquet.aggregatePushdown` on, a bare COUNT/MIN/MAX
    * (no GROUP BY, no post-scan filter) is served from row-group
    * STATISTICS in the parquet footers — the scan reads no data pages at
    * all. At 100 TB this turns "how many rows / what's the value range"
    * from a full-corpus scan into a footer walk, which is why every
    * serious lakehouse keeps these stats hot. The conf is off by default
    * (it changes scan behavior), so the query opens a conf window and
    * materializes its ONE-row result inside it, same discipline as
    * [[graft.operators.Relational.joinBloomRuntime]]; AggPushdownSpec
    * asserts `PushedAggregation` is in the scan and the numbers equal a
    * plain recompute. Caveat pinned by the spec: add a row-level filter
    * and the pushdown correctly disables itself (stats can't answer it). */
  def aggPushdown(s: SparkSession, d: String): DataFrame = {
    // pushdown lives in the DataSource V2 parquet scan; the default
    // useV1SourceList routes parquet through V1, which ignores it.
    // The window opens on s.newSession() (isolated SQLConf, shared
    // SparkContext; builder initialSessionOptions inherited) so the V1→V2
    // source rerouting can never leak into a concurrently planned query
    // on the caller's session — same discipline as joinBloomRuntime.
    val ns = s.newSession()
    Seq(
      "spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> ""
    ).foreach { case (k, v) => ns.conf.set(k, v) }
    val one = aggPushdownPlan(ns, d)
    s.createDataFrame(
      s.sparkContext.parallelize(one.collect().toSeq, 1), one.schema)
  }

  /** The lazy inner plan of [[aggPushdown]] — factored out so the spec
    * asserts `PushedAggregation` on the same plan the query runs. */
  private[sources] def aggPushdownPlan(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // read WITHOUT the nanos-long conversion layer: pushdown must see the
    // raw parquet columns (the events table's ts is converted post-scan,
    // so its min/max would not push; orderkey/price stats do)
    s.read.parquet(s"$d/lineitem.parquet")
      .agg(count(lit(1)).as("n_rows"),
        min($"l_orderkey").as("min_orderkey"),
        max($"l_orderkey").as("max_orderkey"),
        min($"l_extendedprice").as("min_price"),
        max($"l_extendedprice").as("max_price"))
  }

  val aggPushdownOracle: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
      |       min(l_orderkey) AS min_orderkey,
      |       max(l_orderkey) AS max_orderkey,
      |       min(l_extendedprice) AS min_price,
      |       max(l_extendedprice) AS max_price
      |FROM lineitem""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("src_agg_pushdown", Some(aggPushdownOracle), aggPushdown),
    Q("src_csv_roundtrip", Some(segmentProfileSql), csvRoundtrip),
    Q("src_json_roundtrip", Some(segmentProfileSql), jsonRoundtrip),
    Q("src_xml_roundtrip", Some(segmentProfileSql), xmlRoundtrip),
    Q("src_orc_roundtrip", Some(orcRoundtripOracle), orcRoundtrip))
}
