package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Parquet aggregate pushdown (Formats.aggPushdown): the scan carries
  * PushedAggregation (footer stats answer the query, no data pages), the
  * numbers equal a plain recompute, and a row-level filter correctly
  * disables the pushdown. */
class AggPushdownSpec extends SparkSuite {

  private def withConf[T](on: Boolean)(body: => T): T = {
    // V2 scan required: the default useV1SourceList routes parquet
    // through V1, which ignores aggregatePushdown entirely
    val confs = Seq(
      "spark.sql.parquet.aggregatePushdown" -> on.toString,
      "spark.sql.sources.useV1SourceList" -> "")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("bare count/min/max pushes to the scan and matches a plain recompute") {
    import spark.implicits._
    val (plan, rows) = withConf(on = true) {
      val df = Formats.aggPushdownPlan(spark, Sf)
      (df.queryExecution.executedPlan.toString, df.collect().toSeq)
    }
    // the V2 scan prints "PushedAggregation: []" even when nothing
    // pushed — assert on the non-empty COUNT marker, not the key alone
    assert(plan.contains("PushedAggregation: [COUNT(*)"),
      s"aggregate did not push to the parquet scan:\n$plan")
    val want = spark.read.parquet(s"$Sf/lineitem.parquet")
      .agg(count(lit(1)), min($"l_orderkey"), max($"l_orderkey"),
        min($"l_extendedprice"), max($"l_extendedprice"))
      .collect().toSeq
    assert(rows == want)
    // the registered query (conf window + bounded materialization inside)
    assert(Formats.aggPushdown(spark, Sf).collect().toSeq == want)
  }

  test("a row-level filter disables the pushdown — stats cannot answer it") {
    import spark.implicits._
    val plan = withConf(on = true) {
      spark.read.parquet(s"$Sf/lineitem.parquet")
        .filter($"l_quantity" > 25)
        .agg(count(lit(1)))
        .queryExecution.executedPlan.toString
    }
    assert(!plan.contains("PushedAggregation: [COUNT"),
      "pushdown must not claim a filtered aggregate")
  }
}
