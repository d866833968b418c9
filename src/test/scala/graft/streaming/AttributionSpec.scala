package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Stream-stream interval join + last-touch reduction via MemoryStream
  * (controlled micro-batches, no broker — the SessionizeSpec harness). */
class AttributionSpec extends SparkSuite {

  private def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)

  private type Ev = (Long, Long, java.sql.Timestamp)

  test("last-touch picks the latest in-window click, drops stale and clickless purchases") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val out = Attribution.lastTouch(
      pIn.toDS().toDF("event_id", "user_id", "ts"),
      cIn.toDS().toDF("event_id", "user_id", "ts"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("attr_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: clicks at t5 and t20, purchase at t30 → last touch = t20 click
      // user 2: click at t1, purchase at t90 → click is older than the 1h
      //         lookback → no attribution row
      // user 3: purchase at t10, no click at all → no row
      cIn.addData((101L, 1L, ts(5)), (102L, 1L, ts(20)), (201L, 2L, ts(1)))
      pIn.addData((501L, 1L, ts(30)), (502L, 2L, ts(90)), (503L, 3L, ts(10)))
      q.processAllAvailable()
      // far-future rows on BOTH streams push the watermark past every
      // window so the reduction finalizes
      cIn.addData((998L, 99L, ts(10000)))
      pIn.addData((999L, 99L, ts(10000)))
      q.processAllAvailable()
      cIn.addData((996L, 99L, ts(10001)))
      pIn.addData((997L, 99L, ts(10001)))
      q.processAllAvailable()

      val got = spark.table("attr_out")
        .as[(Long, Long, Long)].collect().toSet
      assert(got.contains((501L, 1L, 102L)), s"got $got")
      assert(!got.exists(_._1 == 502L), s"stale click attributed: $got")
      assert(!got.exists(_._1 == 503L), s"clickless purchase emitted: $got")
    } finally q.stop()
  }

  test("left-outer last-touch: clickless and stale-click purchases emit NULL attribution") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val out = Attribution.lastTouchOuter(
      pIn.toDS().toDF("event_id", "user_id", "ts"),
      cIn.toDS().toDF("event_id", "user_id", "ts"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("attr_outer")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // user 1: in-window clicks → attributed to the later one (102)
      // user 2: only a stale click (t1 vs purchase t90, 1h lookback) → NULL
      // user 3: no click at all → NULL
      cIn.addData((101L, 1L, ts(5)), (102L, 1L, ts(20)), (201L, 2L, ts(1)))
      pIn.addData((501L, 1L, ts(30)), (502L, 2L, ts(90)), (503L, 3L, ts(10)))
      q.processAllAvailable()
      cIn.addData((998L, 99L, ts(10000)))
      pIn.addData((999L, 99L, ts(10000)))
      q.processAllAvailable()
      cIn.addData((996L, 99L, ts(10001)))
      pIn.addData((997L, 99L, ts(10001)))
      q.processAllAvailable()

      val got = spark.table("attr_outer")
        .as[(Long, Long, Option[Long])].collect()
        .filterNot(_._2 == 99L).toSet
      assert(got === Set(
        (501L, 1L, Some(102L)),
        (502L, 2L, None),
        (503L, 3L, None)), s"got $got")
    } finally q.stop()
  }

  test("streaming attribution agrees with the batch interval-join last-touch on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"ts", $"event_type")
    val purchases = ev.filter($"event_type" === "purchase").drop("event_type")
    val clicks = ev.filter($"event_type" === "click").drop("event_type")

    // batch twin: same interval-join + max_by reduction, no streaming
    val expected = purchases.as("p").join(clicks.as("c"),
        $"p.user_id" === $"c.user_id" &&
          $"c.ts" <= $"p.ts" &&
          $"c.ts" >= $"p.ts" - expr("INTERVAL 1 HOUR"))
      .groupBy($"p.event_id", $"p.user_id")
      .agg(max_by($"c.event_id", struct($"c.ts", $"c.event_id"))
        .as("last_click_id"))
      .as[(Long, Long, Long)].collect().toSet

    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val out = Attribution.lastTouch(
      pIn.toDS().toDF("event_id", "user_id", "ts"),
      cIn.toDS().toDF("event_id", "user_id", "ts"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("attr_eq")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      pIn.addData(purchases.as[Ev].collect().toSeq: _*)
      cIn.addData(clicks.as[Ev].collect().toSeq: _*)
      q.processAllAvailable()
      val far = ts(10 * 366 * 24 * 60)
      cIn.addData((999998L, 999999L, far)); pIn.addData((999999L, 999999L, far))
      q.processAllAvailable()
      val far2 = new java.sql.Timestamp(far.getTime + 3600000)
      cIn.addData((999996L, 999999L, far2)); pIn.addData((999997L, 999999L, far2))
      q.processAllAvailable()

      val got = spark.table("attr_eq").as[(Long, Long, Long)].collect().toSet
        .filterNot(_._2 == 999999L) // the watermark sentinels
      assert(got.size === expected.size,
        s"streaming ${got.size} rows vs batch ${expected.size}")
      assert(got === expected)
    } finally q.stop()
  }
}
