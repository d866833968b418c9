package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** Targeted user deletion (Warehouse.deleteUsers): rows gone, everything
  * else byte-identical, and — the scale property — partitions that do not
  * contain the users are never rewritten. */
class DeleteSpec extends SparkSuite {

  test("deleteUsers rewrites only the touched minute-partitions") {
    val wh = tmpDir("graft-delete")
    // 18000 events at 10ms = 3 one-minute partitions; user ids are
    // time-local by construction (bucket = id/100), so users drawn from
    // the middle of minute 0 never appear in minutes 1-2
    val events = Events.generate(spark, 18000, 1704067200000L, intervalMs = 10)
    Warehouse.writeEvents(events, wh)

    val before = Warehouse.readEvents(spark, wh)
    val victims = before
      .filter(col("event_timestamp")
        .between("2024-01-01 00:00:10", "2024-01-01 00:00:20"))
      .select(col("user_id")).distinct().localCheckpoint()
    val victimIds = victims.collect().map(_.getString(0)).toSeq
    assert(victimIds.nonEmpty)
    val doomed = before.filter(col("user_id").isin(victimIds: _*)).count()
    assert(doomed > 0)
    val totalBefore = before.count()
    val expectKey = before.filter(!col("user_id").isin(victimIds: _*))
      .agg(expr("bit_xor(xxhash64(event_id))")).head.getLong(0)

    def partMtimes: Map[String, Long] =
      new java.io.File(wh).listFiles()
        .filter(_.getName.startsWith("event_minute=")).flatMap { d =>
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => s"${d.getName}/${f.getName}" -> f.lastModified())
        }.toMap
    val mtimesBefore = partMtimes

    Warehouse.deleteUsers(spark, wh, victims)

    spark.catalog.refreshByPath(wh)
    val after = Warehouse.readEvents(spark, wh)
    assert(after.filter(col("user_id").isin(victimIds: _*)).count() == 0,
      "victim rows survived")
    assert(after.count() == totalBefore - doomed)
    assert(after.agg(expr("bit_xor(xxhash64(event_id))")).head.getLong(0)
      == expectKey, "surviving rows changed")

    val mtimesAfter = partMtimes
    // victims live in minute 0 only; the later two partitions sort after it
    val partDirs = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).map(_.getName).sorted
    assert(partDirs.length == 3)
    for (p <- partDirs.tail; (f, t) <- mtimesBefore if f.startsWith(p + "/"))
      assert(mtimesAfter.get(f).contains(t), s"untouched partition rewritten: $f")
    // and the touched minute really was rewritten (old file replaced)
    val touchedOld = mtimesBefore.keys.filter(_.startsWith(partDirs.head + "/"))
    assert(touchedOld.nonEmpty)
    assert(touchedOld.forall(f => !mtimesAfter.get(f).exists(_ == mtimesBefore(f))),
      "touched partition not rewritten")
  }

  test("deleteUsers with no matching users is a no-op") {
    val wh = tmpDir("graft-delete-noop")
    Warehouse.writeEvents(Events.generate(spark, 6000, 1704067200000L), wh)
    import spark.implicits._
    val mtime = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).head
      .listFiles().filter(_.getName.endsWith(".parquet")).head.lastModified()
    Warehouse.deleteUsers(spark, wh, Seq("no-such-user").toDF("user_id"))
    val same = new java.io.File(wh).listFiles()
      .filter(_.getName.startsWith("event_minute=")).head
      .listFiles().filter(_.getName.endsWith(".parquet")).head.lastModified()
    assert(same == mtime)
    assert(Warehouse.readEvents(spark, wh).count() == 6000)
  }
}
