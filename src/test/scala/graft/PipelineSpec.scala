package graft

import java.time.Instant

import graft.reference.Events

/** The facade: ingest + minutely report as a reference user would call it. */
class PipelineSpec extends SparkSuite {

  test("ingest then minutely report, including the no-data sentinel") {
    val wh = tmpDir("graft-pipe-wh")
    val ckpt = tmpDir("graft-pipe-ckpt")
    val reports = tmpDir("graft-pipe-reports")
    val stage = tmpDir("graft-pipe-stage")

    // 2 minutes of events starting 2024-01-01T00:00:00Z
    Events.generate(spark, 12000, 1704067200000L, intervalMs = 10)
      .write.mode("overwrite").parquet(stage)
    val src = spark.readStream.schema(Events.schema).parquet(stage)
    Pipeline.ingest(src, wh, ckpt).awaitTermination(120000)

    // trigger at 00:02Z analyzes minute 00:01 (previous minute rule)
    val json = Pipeline.minutelyReport(spark, wh, reports,
      Instant.parse("2024-01-01T00:02:30Z"))
    assert(json.contains(""""total_events": 6000"""), json)
    assert(json.contains(""""file_name": "2024-01-01_03-31.parquet""""), json)

    // the SRE readout rides beside the reference counts: p50/p90/p99 of
    // request_latency_ms over the analyzed minute, ordered and inside the
    // generator's latency range [50, 1500]
    val Lat = """"latency_ms": \{"p50": ([0-9.]+), "p90": ([0-9.]+), "p99": ([0-9.]+)\}""".r
    val m = Lat.findFirstMatchIn(json).getOrElse(fail(s"no latency_ms block in $json"))
    val (p50, p90, p99) =
      (m.group(1).toDouble, m.group(2).toDouble, m.group(3).toDouble)
    assert(p50 >= 50 && p99 <= 1500 && p50 <= p90 && p90 <= p99, json)

    // a minute with no data yields the sentinel
    val empty = Pipeline.minutelyReport(spark, wh, reports,
      Instant.parse("2024-01-01T09:00:00Z"))
    assert(empty == """{"report": "No data for 2024-01-01_12-29."}""", empty)
  }
}
