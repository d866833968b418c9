package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

import graft.SparkSuite
import graft.reference.Events

/** The warehouse's additive schema-evolution contract (Warehouse
  * .readEventsAs): era-1 files written before a column existed and era-2
  * files written after coexist in one table — the evolved read null-fills
  * the old era, partition pruning spans both, and the reverse direction
  * (columns the reader stopped asking for) is simply not read. No file is
  * ever rewritten. */
class WarehouseEvolutionSpec extends SparkSuite {

  import spark.implicits._

  private val evolved: StructType =
    Warehouse.warehouseSchema.add("source_region", StringType)

  test("old files null-fill the added column; new files serve it; pruning spans eras") {
    val wh = tmpDir("wh-evolution")
    // era 1: the original schema, minutes 0-9
    val era1 = Events.generate(spark, 600, 1704067200000L, intervalMs = 1000)
    Warehouse.writeEvents(era1, wh)
    // era 2: producer deploy adds source_region, minutes 10-19, APPENDED
    val era2 = Events.generate(spark, 600, 1704067200000L + 600000L, intervalMs = 1000)
      .withColumn("source_region", concat(lit("region-"), col("user_id").substr(1, 1)))
    Warehouse.writeEvents(era2, wh, mode = "append")

    val all = Warehouse.readEventsAs(spark, wh, evolved)
    assert(all.count() === 1200)
    // the added column: null exactly for the old era
    assert(all.filter($"source_region".isNull).count() === 600)
    assert(all.filter($"source_region".isNotNull).count() === 600)
    // era membership is consistent with event time, not accidental
    val cutoff = new java.sql.Timestamp(1704067200000L + 600000L)
    assert(all.filter($"source_region".isNull && $"event_timestamp" >= cutoff)
      .count() === 0)

    // minute pruning still binds to the partition column across eras
    val m1 = Warehouse.readEventsAs(spark, wh, evolved)
      .filter($"event_minute" === lit(new java.sql.Timestamp(1704067200000L)))
    assert(m1.count() === 60 && m1.filter($"source_region".isNotNull).count() === 0)
    val m11 = Warehouse.readEventsAs(spark, wh, evolved)
      .filter($"event_minute" === lit(cutoff))
    assert(m11.count() === 60 && m11.filter($"source_region".isNull).count() === 0)

    // reverse evolution: a reader on the ORIGINAL schema simply never
    // sees the new column — old jobs keep running against new files
    val narrow = Warehouse.readEvents(spark, wh)
    assert(!narrow.columns.contains("source_region"))
    assert(narrow.count() === 1200)
  }
}
