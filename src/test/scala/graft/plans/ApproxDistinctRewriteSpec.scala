package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The approx-distinct consent rule: off by default (bit-exact plans
  * untouched — the whole oracle gate depends on that), rewrites single-
  * column count(DISTINCT) to HLL++ under the flag, kills the Expand,
  * stays within the sketch's error envelope, and leaves multi-column
  * distincts alone. */
class ApproxDistinctRewriteSpec extends SparkSuite {
  import spark.implicits._

  private def withFlag[T](on: Boolean)(body: => T): T = {
    graft.functions.GraftFunctions.register(spark)
    spark.conf.set(ApproxDistinctRewrite.Flag, on.toString)
    try body finally spark.conf.unset(ApproxDistinctRewrite.Flag)
  }

  private def distinctUsers = graft.Tables.events(spark, Sf)
    .groupBy($"event_type")
    .agg(countDistinct($"user_id").as("u"))

  test("flag off (default): plan keeps the exact distinct count") {
    withFlag(on = false) {
      val opt = distinctUsers.queryExecution.optimizedPlan.toString
      assert(opt.contains("count(distinct"), opt)
      assert(!opt.contains("approx_count_distinct"), opt)
    }
  }

  test("flag on: count(DISTINCT x) becomes HLL++; the Expand disappears") {
    withFlag(on = true) {
      val qe = distinctUsers.queryExecution
      val opt = qe.optimizedPlan.toString
      assert(opt.contains("approx_count_distinct"), opt)
      assert(!opt.contains("count(distinct"), opt)
      // the exact plan's Expand stage (distinct-aggregate expansion) is gone
      assert(!qe.executedPlan.toString.contains("Expand"), qe.executedPlan)
    }
  }

  test("approximate counts land inside the 5%-rsd envelope") {
    val exact = withFlag(on = false) {
      distinctUsers.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val approx = withFlag(on = true) {
      distinctUsers.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      assert(math.abs(ap - ex).toDouble / ex <= 0.15,
        s"$k: approx $ap vs exact $ex drifted past 3x the 5% rsd")
    }
  }

  test("multi-column distinct counts are left exact under the flag") {
    withFlag(on = true) {
      val df = graft.Tables.events(spark, Sf)
        .agg(countDistinct($"user_id", $"event_type").as("pairs"))
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("count(distinct"), opt)
      assert(!opt.contains("approx_count_distinct"), opt)
    }
  }
}
