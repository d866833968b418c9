package graft

import org.apache.spark.sql.functions._

import graft.reference.{Events, MinuteReport}
import graft.sources.Warehouse
import graft.streaming.AvroWire

/** The full pipeline in one test, mirroring the reference's e2e layer
  * (SURVEY.md §5 layer 4: seeded rows → final JSON report on storage):
  * generate → Avro wire round-trip (Kafka leg) → minute-partitioned
  * warehouse (ClickHouse leg) → pruned minute read (extract leg) →
  * pivot report JSON (Spark job leg) → report sink (MinIO leg).
  */
class EndToEndSpec extends SparkSuite {

  test("generator → wire → warehouse → minute report JSON") {
    import spark.implicits._
    val wh = tmpDir("graft-e2e-wh")
    val reportDir = tmpDir("graft-e2e-report")

    // 2 minutes of events at the reference's ~100 ev/s
    val produced = Events.generate(spark, 12000, 1704067200000L, intervalMs = 10)

    // Kafka leg: Confluent-framed Avro round trip
    val consumed = AvroWire.decode(AvroWire.encode(AvroWire.asEvents(produced))).toDF()

    // warehouse leg: minute-partitioned parquet with clustering sort
    Warehouse.writeEvents(consumed, wh)

    // extract leg: partition-pruned single-minute read
    val minute = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
    val extracted = Warehouse.readMinute(spark, wh, minute)
    assert(extracted.count() == 6000)

    // analysis leg: pivot report, then the JSON envelope
    val fileName = MinuteReport.tehranMinuteFileName(
      java.time.Instant.parse("2024-01-01T00:02:00Z"))
    assert(fileName == "2024-01-01_03-31.parquet") // +3:30, previous minute
    val report = MinuteReport.analyze(extracted, fileName)
    assert(report.totalEvents == 6000)
    assert(report.totalErrors > 0 && report.totalErrors < 3000)
    assert(report.byEventType.keySet == Events.EventTypes.toSet)
    assert(report.byEventType.values.map { case (s, e) => s + e }.sum == 6000)

    // sink leg: JSON report round trip
    val json = MinuteReport.toJson(report)
    Warehouse.writeReportJson(spark, json, s"$reportDir/r")
    val back = Warehouse.readReportJson(spark, s"$reportDir/r")
    assert(back == json)
    assert(back.contains(""""total_events": 6000"""))
    assert(back.contains(""""file_name": "2024-01-01_03-31.parquet""""))
  }
}
