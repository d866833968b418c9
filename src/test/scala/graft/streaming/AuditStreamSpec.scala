package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming data-quality audit via MemoryStream (controlled
  * micro-batches, no broker — the SessionizeSpec harness): planted
  * violations are counted in the right windows, clean windows certify
  * `passed`, and the stream agrees with the batch aggregation of the
  * same rows. */
class AuditStreamSpec extends SparkSuite {

  private def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)

  // (event_id, ts, event_type, value, props)
  private type Ev = (Long, java.sql.Timestamp, String, Double, String)

  test("planted violations land in their windows; clean windows pass") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val out = AuditStream.windowedAudit(
      in.toDS().toDF("event_id", "ts", "event_type", "value", "props"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("audit_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(
        // minute 0: clean
        (1L, ts(0), "click", 10.0, "{}"),
        (2L, ts(0), "view", 5.0, "{}"),
        // minute 1: one null props, one bogus type, one negative value
        (3L, ts(1), "click", 1.0, null),
        (4L, ts(1), "BOGUS", 1.0, "{}"),
        (5L, ts(1), "view", -3.0, "{}"))
      q.processAllAvailable()
      in.addData((99L, ts(10000), "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData((98L, ts(10001), "click", 1.0, "{}"))
      q.processAllAvailable()

      val rows = spark.table("audit_out")
        .select($"window_start", $"n_rows", $"null_props", $"bad_type",
          $"neg_value", $"passed")
        .as[(java.sql.Timestamp, Long, Long, Long, Long, Boolean)]
        .collect().map(r => r._1 -> r).toMap
      val clean = rows(ts(0))
      assert(clean._2 === 2 && clean._6, s"clean window: $clean")
      val dirty = rows(ts(1))
      assert(dirty._2 === 3 && dirty._3 === 1 && dirty._4 === 1 &&
        dirty._5 === 1 && !dirty._6, s"dirty window: $dirty")
    } finally q.stop()
  }

  test("stream agrees with the equivalent batch aggregation on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ev = graft.Tables.events(spark, Sf)
      .select($"event_id", $"ts", $"event_type", $"value", $"props")
    // batch: the same aggregation expressed on the static frame
    val batch = AuditStream.windowedAudit(ev, watermark = "0 seconds")
    // a static frame ignores watermarks — windowedAudit's plan is reusable
    // batch-side as-is (one contract, two runtimes)
    val expect = batch.orderBy($"window_start").collect()

    val in = MemoryStream[(Long, java.sql.Timestamp, String, Double, String)]
    val out = AuditStream.windowedAudit(
      in.toDS().toDF("event_id", "ts", "event_type", "value", "props"),
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("audit_batch_agree")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(ev.as[(Long, java.sql.Timestamp, String, Double, String)]
        .collect().toSeq)
      q.processAllAvailable()
      in.addData((999999L, new java.sql.Timestamp(4102444800000L), "click", 1.0, "{}"))
      q.processAllAvailable()
      in.addData((999998L, new java.sql.Timestamp(4102444860000L), "click", 1.0, "{}"))
      q.processAllAvailable()
      val got = spark.table("audit_batch_agree")
        .filter($"window_start" < "2099-01-01")
        .orderBy($"window_start").collect()
      assert(got.length === expect.length,
        s"windows: stream ${got.length} vs batch ${expect.length}")
      got.zip(expect).foreach { case (g, e) => assert(g === e) }
    } finally q.stop()
  }
}
