package graft.sources

import graft.SparkSuite

/** Row-level round-trip proofs for the interchange formats: the oracle
  * gate shows the AGGREGATES survive; these show every row and every
  * value does (set equality against the parquet original), plus the
  * pushdown asymmetry that makes text formats ingest-only at scale.
  */
class FormatsSpec extends SparkSuite {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("CSV round-trip preserves every customer row exactly") {
    val orig = graft.Tables.customer(spark, Sf)
    val back = {
      // csvRoundtrip aggregates; re-read its materialized dir raw
      Formats.csvRoundtrip(spark, Sf).count() // force the write
      val dir = Formats.dirFor(spark, Sf, "csv").get
      spark.read.schema(orig.schema).option("header", "true").csv(dir)
    }
    assert(rows(back) === rows(orig))
  }

  test("JSON round-trip preserves every customer row exactly") {
    val orig = graft.Tables.customer(spark, Sf)
    val back = {
      Formats.jsonRoundtrip(spark, Sf).count()
      val dir = Formats.dirFor(spark, Sf, "json").get
      spark.read.schema(orig.schema).json(dir)
    }
    assert(rows(back) === rows(orig))
  }

  test("XML round-trip preserves every customer row exactly") {
    val orig = graft.Tables.customer(spark, Sf)
    val back = {
      Formats.xmlRoundtrip(spark, Sf).count()
      val dir = Formats.dirFor(spark, Sf, "xml").get
      spark.read.schema(orig.schema).option("rowTag", "customer").xml(dir)
    }
    assert(rows(back) === rows(orig))
  }

  test("ORC round-trip preserves every orders row; ORC scan takes pushed filters") {
    import org.apache.spark.sql.functions._
    val orig = graft.Tables.orders(spark, Sf)
    Formats.orcRoundtrip(spark, Sf).count()
    val dir = Formats.dirFor(spark, Sf, "orc").get
    val back = spark.read.orc(dir)
    assert(rows(back) === rows(orig))
    val plan = back.filter(col("o_totalprice") > 100000.0)
      .queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(_.contains("o_totalprice")), plan.take(800))
  }

}
