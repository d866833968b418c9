package graft.reference

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Generator invariants — the data-dependent null rules the reference
  * enforces in its producer (SURVEY.md §1.2; reference
  * producer/tests/test_unit.py:18-78). */
class EventsGenSpec extends SparkSuite {

  private lazy val df =
    Events.generate(spark, 10000, 1704067200000L, errorProb = 0.25).cache()

  test("error_code non-null iff status = ERROR") {
    assert(df.filter(col("status") === "ERROR" && col("error_code").isNull).count() == 0)
    assert(df.filter(col("status") === "SUCCESS" && col("error_code").isNotNull).count() == 0)
  }

  test("product_id non-null iff event_type in {VIEW_PRODUCT, ADD_TO_CART}") {
    assert(df.filter(
      col("event_type").isin(Events.ProductEventTypes: _*) &&
        col("product_id").isNull).count() == 0)
    assert(df.filter(
      !col("event_type").isin(Events.ProductEventTypes: _*) &&
        col("product_id").isNotNull).count() == 0)
  }

  test("value domains match the producer's ranges") {
    assert(df.filter(!col("event_type").isin(Events.EventTypes: _*)).count() == 0)
    assert(df.filter(col("request_latency_ms") < 50 || col("request_latency_ms") > 1500).count() == 0)
    assert(df.filter(col("error_code").isNotNull &&
      (col("error_code") < 400 || col("error_code") > 599)).count() == 0)
    assert(df.filter(col("product_id").isNotNull &&
      (col("product_id") < 1 || col("product_id") > 10000)).count() == 0)
  }

  test("seeded generation is deterministic") {
    // bit_xor, not sum: ANSI mode (Spark 4 default) overflows on long sums
    val a = Events.generate(spark, 1000, 0L, seed = 7L)
      .agg(expr("bit_xor(xxhash64(event_id, status, event_type))")).head.getLong(0)
    val b = Events.generate(spark, 1000, 0L, seed = 7L)
      .agg(expr("bit_xor(xxhash64(event_id, status, event_type))")).head.getLong(0)
    assert(a == b)
  }

  test("error rate tracks errorProb") {
    val errRate = df.filter(col("status") === "ERROR").count().toDouble / df.count()
    assert(errRate > 0.2 && errRate < 0.3, s"got $errRate")
  }

  test("uuid shape") {
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
    assert(df.filter(!col("event_id").rlike(re)).count() == 0)
  }
}
