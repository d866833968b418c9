package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Streaming twin of the batch within-window dedup
  * (Temporal.dedupEventWindow): `dropDuplicatesWithinWatermark` keyed on
  * (user, type, hour) elects the same survivors as the batch
  * `row_number = 1` formula when redeliveries arrive inside the
  * watermark AND after their originals — the retry case. The twins are
  * not equivalent in general: streaming keeps the first-ARRIVED row per
  * key, batch keeps min(ts, event_id), so an out-of-event-time-order
  * duplicate would be kept by streaming and dropped by batch (this
  * fixture's arrival order matches event-time order, as retries do).
  * The watermark bounds the state (the whole point at 100 TB: dedup
  * state that expires instead of growing with the corpus). */
class StreamingDedupSpec extends SparkSuite {

  test("streaming dedup elects the batch twin's survivors") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // (event_id, ts, user, type): ids 2,4 are in-hour redeliveries of 1,3;
    // id 5 is the same (user, type) in the NEXT hour — a fresh window
    val events = Seq(
      (1L, ts(0), 7L, "click"), (2L, ts(5), 7L, "click"),
      (3L, ts(1), 7L, "view"), (4L, ts(20), 7L, "view"),
      (6L, ts(2), 8L, "click"))
    val next = (5L, java.sql.Timestamp.valueOf("2024-01-01 11:01:00"), 7L, "click")

    val in = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val deduped = in.toDF().toDF("event_id", "ts", "user_id", "event_type")
      .withWatermark("ts", "30 minutes")
      .withColumn("hour", date_trunc("hour", $"ts"))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hour")
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_stream").outputMode("append").start()
    try {
      in.addData(events: _*); q.processAllAvailable()
      in.addData(next); q.processAllAvailable()
      val got = spark.table("dedup_stream")
        .select($"event_id").as[Long].collect().toSet

      val batch = Seq(events: _*) :+ next
      val win = Window
        .partitionBy($"user_id", $"event_type", date_trunc("hour", $"ts"))
        .orderBy($"ts", $"event_id")
      val want = batch.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("rn", row_number().over(win))
        .filter($"rn" === 1).select($"event_id").as[Long].collect().toSet

      assert(want == Set(1L, 3L, 6L, 5L))
      assert(got == want, s"streaming $got vs batch $want")
    } finally q.stop()
  }

  test("batch dedup summary counts planted duplicates per hour") {
    import spark.implicits._
    // epoch MICROS longs — the on-disk contract Tables.events reads
    def ts(h: Int, m: Int) =
      1704067200000000L + h * 3600000000L + m * 60000000L
    // hour 10: (7,click)x3 + (8,click)x1 -> kept 2, dropped 2
    // hour 11: (7,click)x1              -> kept 1, dropped 0
    val rows = Seq(
      (1L, ts(10, 0), 7L, "click", 0.0, "{}"),
      (2L, ts(10, 5), 7L, "click", 0.0, "{}"),
      (3L, ts(10, 9), 7L, "click", 0.0, "{}"),
      (4L, ts(10, 2), 8L, "click", 0.0, "{}"),
      (5L, ts(11, 1), 7L, "click", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("graft-dedup-win")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.Temporal.dedupEventWindow(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      ("2024-01-01 10:00", 4L, 2L, 2L),
      ("2024-01-01 11:00", 1L, 1L, 0L)))
  }
}
