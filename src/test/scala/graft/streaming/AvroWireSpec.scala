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

  test("decode fails fast on a corrupt frame (errors.tolerance none)") {
    import spark.implicits._
    val bad = Seq(Array[Byte](9, 9, 9)).toDF("value")
    val ex = intercept[Exception](AvroWire.decode(bad).collect())
    assert(ex.getMessage.contains("Confluent frame") ||
      ex.getCause != null)
  }
}
