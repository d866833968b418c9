package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** End-to-end wire ingest against a staged bytes "topic": the in-sandbox
  * stand-in for `readStream.format("kafka")` (no kafka jars here) — the
  * fixture stages Confluent-framed (key, value) records as parquet, streams
  * them back with the exact (binary, binary) schema a Kafka source yields,
  * and drives decode → SMT shaping → checkpointed minute-partitioned
  * warehouse in one query. Mixed v1/v2 frames on the same topic. */
class WireIngestSpec extends SparkSuite {

  test("wire topic (mixed v1/v2) -> decode -> warehouse, end to end") {
    import spark.implicits._
    val topic = tmpDir("wire-topic")
    val wh = tmpDir("wire-wh")
    val ckpt = tmpDir("wire-ckpt")

    // stage the "topic": 2 minutes of events, Confluent-framed, v1 and v2
    // producers writing side by side (a mid-rollout topic)
    val events = Events.generate(spark, 12000, 1704067200000L, intervalMs = 10)
    val typed = AvroWire.asEvents(events)
    AvroWire.encode(typed.filter(_.event_id < "8"))
      .union(AvroWire.encode(typed.filter(_.event_id >= "8"), AvroWire.SchemaIdV2))
      .write.mode("overwrite").parquet(topic)

    // the Kafka-shaped source: (key binary, value binary) stream
    val wire = spark.readStream
      .schema("key BINARY, value BINARY")
      .parquet(topic)
    Ingest.startWireIngest(wire, wh, ckpt).awaitTermination(120000)

    val got = graft.sources.Warehouse.readEvents(spark, wh)
    assert(got.count() == 12000)
    // field-level fidelity through frame + decode + sink
    val a = events.orderBy("event_id").collect()
    val b = got.select(events.columns.map(col): _*).orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq, "wire round trip must preserve every field")
    // warehouse still partitioned + prunable, same as native ingest
    val parts = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).map(_.getName).sorted
    assert(parts.length == 2, parts.mkString(","))
  }
}
