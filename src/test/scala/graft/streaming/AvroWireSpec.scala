package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** Avro wire-format round trip (the Kafka leg without a broker). */
class AvroWireSpec extends SparkSuite {

  private lazy val events =
    Events.generate(spark, 500, 1704067200000L).cache()

  test("encode/decode round trip preserves every field") {
    import spark.implicits._
    val typed = AvroWire.asEvents(events)
    val wire = AvroWire.encode(typed)
    val back = AvroWire.decode(wire)
    val a = typed.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.length == 500)
    assert(a.toSeq == b.toSeq)
  }

  test("wire format: Confluent 5-byte header, 16-byte uuid key") {
    import spark.implicits._
    val row = AvroWire.encode(AvroWire.asEvents(events)).head()
    val key = row.getAs[Array[Byte]]("key")
    val value = row.getAs[Array[Byte]]("value")
    assert(key.length == 16)
    assert(value(0) == 0)
    assert(java.nio.ByteBuffer.wrap(value, 1, 4).getInt == AvroWire.SchemaId)
  }

  test("column-expression key serializer matches the UUID byte layout") {
    import spark.implicits._
    val df = events.limit(50)
      .select(col("user_id"), AvroWire.uuidBytesCol(col("user_id")).as("kb"))
    df.collect().foreach { r =>
      val u = java.util.UUID.fromString(r.getString(0))
      val expect = java.nio.ByteBuffer.allocate(16)
        .putLong(u.getMostSignificantBits).putLong(u.getLeastSignificantBits).array()
      assert(r.getAs[Array[Byte]]("kb").toSeq == expect.toSeq)
    }
  }

  test("schema evolution: mixed v1/v2 topic decodes in one pass") {
    import spark.implicits._
    val typed = AvroWire.asEvents(events)
    val v1 = AvroWire.encode(typed.filter(_.event_id < "8"))
    val v2 = AvroWire.encode(typed.filter(_.event_id >= "8"), AvroWire.SchemaIdV2)
    assert(v2.count() > 0, "need some v2 frames for the test to bite")
    // frame ids really differ
    assert(v2.head().getAs[Array[Byte]]("value").slice(1, 5).last == 2)
    val back = AvroWire.decode(v1.union(v2))
    val a = typed.orderBy("event_id").collect()
    val b = back.orderBy("event_id").collect()
    assert(a.toSeq == b.toSeq, "v2 payloads must resolve against the v1 reader")
  }

  test("schema evolution: v1 payload against the v2 reader fills the default") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import org.apache.avro.io.DecoderFactory
    import spark.implicits._
    val body = AvroWire.encode(AvroWire.asEvents(events.limit(1)))
      .head().getAs[Array[Byte]]("value").drop(5)
    val reader = new GenericDatumReader[GenericRecord](
      new Schema.Parser().parse(AvroWire.SchemaJson),
      new Schema.Parser().parse(AvroWire.SchemaV2Json))
    val rec = reader.read(null, DecoderFactory.get().binaryDecoder(body, null))
    assert(rec.get("channel").toString == "UNKNOWN",
      "added-with-default field must materialize its default for old payloads")
  }

  test("decode fails fast on an UNKNOWN schema id") {
    import spark.implicits._
    val frame = AvroWire.encode(AvroWire.asEvents(events.limit(1)))
      .head().getAs[Array[Byte]]("value")
    frame(4) = 99 // id 99 not in the registry
    val ex = intercept[Exception](
      AvroWire.decode(Seq(frame).toDF("value")).collect())
    assert(ex.getMessage.contains("unknown schema id") ||
      Option(ex.getCause).exists(_.getMessage.contains("unknown schema id")))
  }

  test("decode fails fast on a corrupt frame (errors.tolerance none)") {
    import spark.implicits._
    val bad = Seq(Array[Byte](9, 9, 9)).toDF("value")
    val ex = intercept[Exception](AvroWire.decode(bad).collect())
    assert(ex.getMessage.contains("Confluent frame") ||
      ex.getCause != null)
  }
}
