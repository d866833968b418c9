package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** Incremental rollup maintenance: applying batches one at a time must
  * equal recomputing the rollup from all events at once; partitions not
  * touched by a batch must not be rewritten; a replayed batch id is a
  * no-op.
  */
class RollupSpec extends SparkSuite {
  import spark.implicits._

  private def mkEvents(n: Long, startMs: Long) =
    Events.withEventMinute(
      Events.generate(spark, n, startMs, intervalMs = 1000))

  private def rollup(dir: String) =
    spark.read.parquet(dir)
      .select($"event_minute", $"event_type", $"status", $"cnt")
      .as[(java.sql.Timestamp, String, String, Long)].collect().toSet

  test("two incremental upserts equal one full recompute") {
    val dir = tmpDir("rollup") + "/r"
    val t0 = 1704067200000L
    val b1 = mkEvents(300, t0)                    // minutes 0-4
    val b2 = mkEvents(300, t0 + 3 * 60 * 1000L)   // minutes 3-7: overlaps 3-4
    Ingest.upsertRollup(b1, dir)
    Ingest.upsertRollup(b2, dir)
    val expect = b1.unionByName(b2)
      .groupBy($"event_minute", $"event_type", $"status")
      .agg(count(lit(1)).as("cnt"))
      .as[(java.sql.Timestamp, String, String, Long)].collect().toSet
    assert(rollup(dir) == expect)
  }

  test("untouched partitions are not rewritten (incremental, not full refresh)") {
    val dir = tmpDir("rollup") + "/r"
    val t0 = 1704067200000L
    Ingest.upsertRollup(mkEvents(120, t0), dir) // minutes 0-1
    def partFiles(minuteGlob: String) = {
      val base = new java.io.File(dir)
      base.listFiles().filter(_.getName.startsWith("event_minute="))
        .filter(_.getName.contains(minuteGlob))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
    }
    val before = partFiles("00%3A00") // minute 0 partition dir
    assert(before.nonEmpty)
    Thread.sleep(1100) // ensure mtime resolution can't mask a rewrite
    // second batch touches ONLY minutes 5-6
    Ingest.upsertRollup(mkEvents(120, t0 + 5 * 60 * 1000L), dir)
    val after = partFiles("00%3A00")
    assert(after == before, "minute-0 partition files must be untouched")
  }

  test("streamed maintenance equals batch recompute; replayed marker is a no-op") {
    val base = tmpDir("rollup-stream")
    val dir = s"$base/rollup"
    val events = mkEvents(240, 1704067200000L)
    val src = tmpDir("rollup-src")
    events.write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(events.schema)
      .parquet(src)
    val q = Ingest.startRollupMaintenance(stream, dir, s"$base/ckpt")
    q.awaitTermination()
    val expect = events
      .groupBy($"event_minute", $"event_type", $"status")
      .agg(count(lit(1)).as("cnt"))
      .as[(java.sql.Timestamp, String, String, Long)].collect().toSet
    assert(rollup(dir) == expect)
    // replay batch 0 by hand: the marker must make it a no-op
    Ingest.startRollupMaintenance(
      spark.readStream.schema(events.schema).parquet(src),
      dir, s"$base/ckpt2") // fresh checkpoint → same data replays as batch 0
      .awaitTermination()
    assert(rollup(dir) == expect, "replayed batch must not double-count")
  }

  test("sketch rollup: incremental upserts re-slice to exact DAU at any grain") {
    val dir = tmpDir("rollup-sk") + "/r"
    val t0 = 1704067200000L
    val b1 = mkEvents(300, t0)                    // minutes 0-4
    val b2 = mkEvents(300, t0 + 3 * 60 * 1000L)   // minutes 3-7: overlaps 3-4
    Ingest.upsertSketchRollup(b1, dir)
    Ingest.upsertSketchRollup(b2, dir)
    val all = b1.unionByName(b2)
    // per-minute distinct users served FROM the maintained view (coupon
    // regime at this cardinality → sketch estimates are exact)
    val got = spark.read.parquet(dir)
      .groupBy($"event_minute")
      .agg(hll_sketch_estimate(hll_union_agg($"user_sketch")).as("dau"),
        sum($"cnt").as("n"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val expect = all
      .groupBy($"event_minute")
      .agg(countDistinct($"user_id").as("dau"), count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === expect)
    // and the coarser grain for free: total distinct users over all cells
    val total = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg($"user_sketch"))).head().getLong(0)
    val exactTotal = all.select(countDistinct($"user_id")).head().getLong(0)
    assert(total === exactTotal)
  }

  test("trailing-window distinct users served from the sketch rollup") {
    val dir = tmpDir("rollup-trail") + "/r"
    val t0 = 1704067200000L
    val b1 = mkEvents(300, t0)                    // minutes 0-4
    val b2 = mkEvents(300, t0 + 3 * 60 * 1000L)   // minutes 3-7: overlaps 3-4
    Ingest.upsertSketchRollup(b1, dir)
    Ingest.upsertSketchRollup(b2, dir)
    val all = b1.unionByName(b2)
    val w = 3
    val got = Ingest.servedTrailingDistinct(spark, dir, windowMinutes = w)
      .as[(java.sql.Timestamp, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // exact trailing recompute from the raw batches (coupon regime →
    // sketch estimates are exact at this cardinality)
    val minutes = all.select($"event_minute").distinct()
      .as[java.sql.Timestamp].collect()
    assert(got.keySet == minutes.toSet)
    minutes.foreach { m =>
      val lo = new java.sql.Timestamp(m.getTime - (w - 1) * 60000L)
      val win = all.filter($"event_minute".between(lo, m))
      val exactUsers = win.select(countDistinct($"user_id")).head().getLong(0)
      val exactEvents = win.count()
      assert(got(m) == (exactUsers, exactEvents), s"minute $m")
    }
  }
}
