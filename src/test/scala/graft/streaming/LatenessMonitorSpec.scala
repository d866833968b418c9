package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** Maintained lateness monitor (Ingest.upsertLatenessMonitor /
  * servedWatermarkPlan): hand-computed buckets and recommendation across
  * three incremental batches, pre-batch high-water-mark semantics. */
class LatenessMonitorSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00:00 UTC millis

  /** A crafted batch with exact event times (seconds after T0). */
  private def batchAt(secs: Seq[Long]) =
    Events.withEventMinute(
      secs.zipWithIndex.map { case (s, i) =>
        (i.toLong, new java.sql.Timestamp(T0 + s * 1000L))
      }.toDF("event_id", "event_timestamp"))

  test("three batches: buckets, HWM progression, served recommendation") {
    val dir = tmpDir("graft-late") + "/m"
    // batch 1: 120 in-order events 1s apart (t = 0..119s); all on time
    // by definition (no prior HWM); post-batch HWM = 119s
    Ingest.upsertLatenessMonitor(
      Events.withEventMinute(Events.generate(spark, 120, T0, intervalMs = 1000)),
      dir)
    // batch 2 vs HWM 119: late by 8s / 45s / 200s, one on-time at 129s
    Ingest.upsertLatenessMonitor(
      batchAt(Seq(119 - 8, 119 - 45, 119 - 200, 129)), dir)
    // batch 3 vs HWM 129: one late by 4s
    Ingest.upsertLatenessMonitor(batchAt(Seq(129 - 4)), dir)

    val r = Ingest.servedWatermarkPlan(spark, dir).head()
    assert(r.getLong(0) == 125L, "n_events")
    assert(r.getLong(1) == 121L, "n_on_time")     // 120 + the 129s row
    assert(r.getLong(2) == 2L, "late <= 10s")     // 8s and 4s
    assert(r.getLong(3) == 1L, "10 < late <= 60") // 45s
    assert(r.getLong(4) == 1L, "late > 60")       // 200s
    assert(r.getLong(5) == 200L, "max_late_s")
    // 99% of 125 needs 124 covered: c30 = 123 fails, c60 = 124 covers
    assert(r.getLong(6) == 60L, "recommended_watermark_s")
  }

  test("intra-batch disorder is not lateness; the HWM is pre-batch") {
    val dir = tmpDir("graft-late2") + "/m"
    // one batch whose rows are internally out of order: no prior HWM,
    // so everything is on time — a micro-batch is an unordered set
    Ingest.upsertLatenessMonitor(batchAt(Seq(100, 40, 70)), dir)
    val r1 = Ingest.servedWatermarkPlan(spark, dir).head()
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L && r1.getLong(6) == 0L)
    // the NEXT batch is measured against max(100), not against 70
    Ingest.upsertLatenessMonitor(batchAt(Seq(100 - 7)), dir)
    val r2 = Ingest.servedWatermarkPlan(spark, dir).head()
    assert(r2.getLong(2) == 1L, "7s late vs the pre-batch HWM")
    assert(r2.getLong(5) == 7L)
  }
}
