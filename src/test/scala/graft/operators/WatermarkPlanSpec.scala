package graft.operators

import graft.SparkSuite

/** Watermark-sizing advisor (Temporal.watermarkPlan): planted
  * out-of-order arrivals with hand-computed lateness buckets and
  * recommendation, plan hygiene, and the in-order real corpus. */
class WatermarkPlanSpec extends SparkSuite {

  test("planted disorder: buckets and recommendation match hand computation") {
    import spark.implicits._
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC micros
    def us(sec: Long) = t0 + sec * 1000000L
    // arrival order = event_id; event times jump back by varying amounts:
    //  id 1: t=100            -> late 0
    //  id 2: t=200            -> late 0
    //  id 3: t=195 (5s back)  -> late 5   (<=10 bucket; c1 misses, c5 catches)
    //  id 4: t=300            -> late 0
    //  id 5: t=250 (50s back) -> late 50  (<=60 bucket)
    //  id 6: t=310            -> late 0
    //  id 7: t=305            -> late 5
    //  id 8: t=400            -> late 0
    //  id 9: t=40 (360s back) -> late 360 (> 300 candidate -> max fallback)
    //  id 10: t=500           -> late 0
    val rows = Seq(
      (1L, us(100)), (2L, us(200)), (3L, us(195)), (4L, us(300)),
      (5L, us(250)), (6L, us(310)), (7L, us(305)), (8L, us(400)),
      (9L, us(40)), (10L, us(500)))
      .map { case (id, t) => (id, t, 1L, "click", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("graft-wm")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Temporal.watermarkPlan(spark, dir).head()
    assert(r.getLong(0) == 10L, "n_events")
    assert(r.getLong(1) == 6L, "n_on_time")
    assert(r.getLong(2) == 2L, "n_late_le_10s")
    assert(r.getLong(3) == 1L, "n_late_le_60s")
    assert(r.getLong(4) == 1L, "n_late_gt_60s")
    assert(r.getLong(5) == 360L, "max_late_s")
    // 99% of 10 needs all 10 covered; only max_late_s (360) covers id 9
    assert(r.getLong(6) == 360L, "recommended_watermark_s")
  }

  test("a 1%-late tail picks the smallest covering candidate, not the max") {
    import spark.implicits._
    val t0 = 1704067200000000L
    // 980 in-order events, then 20 arrivals all stamped 8s before the
    // running max (2% late): the 99% envelope fails at candidates 0/1/5
    // and is first covered by the 10s candidate
    val inOrder = (1L to 980L).map(i => (i, t0 + i * 1000000L))
    val late = (981L to 1000L).map(i => (i, t0 + 972L * 1000000L))
    val rows = (inOrder ++ late)
      .map { case (id, t) => (id, t, 1L, "click", 0.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("graft-wm2")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Temporal.watermarkPlan(spark, dir).head()
    assert(r.getLong(0) == 1000L)
    assert(r.getLong(1) == 980L, "on time")
    // 98% on time < 99% -> candidate 0 and 1 and 5 fail, 10 covers (8s late)
    assert(r.getLong(6) == 10L, "recommendation should be the 10s candidate")
  }

  test("no unpartitioned window in the plan; real corpus is in order") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    val df = Temporal.watermarkPlan(spark, Sf)
    // the prefix scan must run as per-bucket windows, never one global
    // sort; the only SinglePartition left is the benign 13-value final
    // combine of the scalar aggregate (also asserted fleet-wide by
    // PlanHygieneSpec, which this query now passes through)
    def flatten(p: SparkPlan): Seq[SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
        case _ => p.children.flatMap(flatten)
      })
    val badWindows = flatten(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
    }
    assert(badWindows.isEmpty, badWindows.mkString(","))
    val r = df.head()
    assert(r.getLong(0) == r.getLong(1), "generator emits in order")
    assert(r.getLong(6) == 0L)
  }
}
