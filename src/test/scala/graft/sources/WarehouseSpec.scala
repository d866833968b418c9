package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.{Events, MinuteReport}

/** M2 storage layer: partition pruning, within-partition sort (the
  * MergeTree ORDER BY analog), JSON report sink round-trip. */
class WarehouseSpec extends SparkSuite {

  test("warehouse write partitions by minute and prunes on read") {
    val wh = tmpDir("graft-warehouse")
    val events = Events.generate(spark, 18000, 1704067200000L, intervalMs = 10)
    Warehouse.writeEvents(events, wh)

    val dirs = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).map(_.getName).sorted
    assert(dirs.length == 3)

    val m = java.sql.Timestamp.valueOf("2024-01-01 00:01:00")
    val one = Warehouse.readMinute(spark, wh, m)
    assert(one.count() == 6000)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_minute"), plan)

    // one file per minute partition (repartition before partitionBy)
    val files = new java.io.File(s"$wh/${dirs.head}").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 1, files.mkString(","))
  }

  test("rows inside a partition are sorted by (event_type, event_timestamp)") {
    val wh = tmpDir("graft-warehouse-sort")
    Warehouse.writeEvents(Events.generate(spark, 6000, 1704067200000L), wh)
    val part = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).head
    val rows = spark.read.parquet(part.toString)
      .select("event_type", "event_timestamp").collect()
    val seq = rows.map(r => (r.getString(0), r.getTimestamp(1).getTime))
    assert(seq.zip(seq.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2)
    }, "partition not sorted")
  }

  test("events round-trip through csv, json, and orc sources/sinks") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("graft-formats")
    val events = Events.generate(spark, 500, 1704067200000L)
    val key = events.select(
      org.apache.spark.sql.functions.expr("bit_xor(xxhash64(event_id, status, event_type))"))
      .head.getLong(0)
    for (fmt <- Seq("csv", "json", "orc")) {
      val path = s"$base/$fmt"
      val w = events.write.mode("overwrite").format(fmt)
      (if (fmt == "csv") w.option("header", "true") else w).save(path)
      val r = spark.read.format(fmt).schema(Events.schema)
      val back = (if (fmt == "csv") r.option("header", "true") else r).load(path)
      assert(back.count() == 500, s"$fmt count")
      val backKey = back.select(
        org.apache.spark.sql.functions.expr("bit_xor(xxhash64(event_id, status, event_type))"))
        .head.getLong(0)
      assert(backKey == key, s"$fmt content hash mismatch")
      assert(back.filter(col("status") === "ERROR" && col("error_code").isNull).count() == 0,
        s"$fmt lost nullable semantics")
    }
  }

  test("compaction merges small files per partition, preserving rows and sort") {
    val wh = tmpDir("graft-compact-in")
    val out = tmpDir("graft-compact-out")
    // two appends -> 2 files per minute partition
    Warehouse.writeEvents(Events.generate(spark, 6000, 1704067200000L), wh)
    Events.withEventMinute(Events.generate(spark, 6000, 1704067200000L, seed = 7L))
      .write.mode("append").partitionBy("event_minute").parquet(wh)
    val before = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).head
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 2, s"expected fragmented input, got $before files")

    Warehouse.compact(spark, wh, out)
    val partDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_minute="))
    assert(partDirs.forall(_.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    assert(spark.read.parquet(out).count() == 12000)
    val rows = spark.read.parquet(partDirs.head.toString)
      .select("event_type", "event_timestamp").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime))
    assert(rows.zip(rows.tail).forall { case (a, b) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2) }, "compacted partition not clustered")
  }

  test("JSON report sink round-trip") {
    val dir = tmpDir("graft-report")
    val events = Events.generate(spark, 1000, 1704067200000L)
    val report = MinuteReport.analyze(events, "2024-01-01_03-29.parquet")
    val json = MinuteReport.toJson(report)
    Warehouse.writeReportJson(spark, json, s"$dir/report")
    assert(Warehouse.readReportJson(spark, s"$dir/report") == json)
  }
}
