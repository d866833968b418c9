package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.MisraGries
import graft.reference.Events

/** The frequency-bearing maintained view (Ingest.upsertHeavyHitterRollup):
  * incrementally-built Misra–Gries cells must serve per-user counts
  * within the deterministic n/(k+1) guarantee at EVERY grain — per-minute
  * (cell as built) and global (cells merged) — with exact total counts,
  * all measured against the raw events the view was built from. k is set
  * BELOW the corpus's distinct-user count so the global re-slice
  * exercises the lossy truncation path, not an exact map.
  */
class HeavyHitterRollupSpec extends SparkSuite {
  import spark.implicits._

  private def mkEvents(n: Long, startMs: Long) =
    Events.withEventMinute(
      Events.generate(spark, n, startMs, intervalMs = 1000))

  private def assertGuarantee(s: MisraGries.SummaryS,
      exact: Map[String, Long]): Unit = {
    assert(s.n === exact.values.sum)
    val bound = s.errorBound
    for ((k, est) <- s.entries) {
      val t = exact.getOrElse(k, 0L)
      assert(est <= t, s"overestimate: key=$k est=$est true=$t")
      assert(est >= t - bound, s"under bound: key=$k est=$est true=$t bound=$bound")
    }
    for ((k, t) <- exact if t > bound)
      assert(s.estimate(k) > 0L, s"heavy key missing: key=$k true=$t bound=$bound")
  }

  test("incremental cells serve guaranteed heavy hitters at minute and global grain") {
    val dir = tmpDir("rollup-mg") + "/r"
    val t0 = 1704067200000L
    val b1 = mkEvents(600, t0)                    // minutes 0-9
    val b2 = mkEvents(600, t0 + 5 * 60 * 1000L)   // minutes 5-14: overlaps 5-9
    val k = 4 // ~13 distinct users in the union -> global merge truncates
    Ingest.upsertHeavyHitterRollup(b1, dir, k)
    Ingest.upsertHeavyHitterRollup(b2, dir, k)
    val all = b1.unionByName(b2)
    val view = spark.read.parquet(dir)

    // counts exact at the cell grain
    val gotCnt = view.select($"event_minute", $"cnt")
      .as[(java.sql.Timestamp, Long)].collect().toMap
    val expCnt = all.groupBy($"event_minute").agg(count(lit(1)).as("cnt"))
      .as[(java.sql.Timestamp, Long)].collect().toMap
    assert(gotCnt == expCnt)

    val exactByMinute = all.select($"event_minute", $"user_id").collect()
      .groupBy(_.getTimestamp(0))
      .view.mapValues(_.groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap)
      .toMap

    // per-minute: each cell's summary against that minute's exact counts
    for (r <- view.select($"event_minute", $"users_mg").collect()) {
      val s = MisraGries.deserializeS(r.getAs[Array[Byte]]("users_mg"))
      assertGuarantee(s, exactByMinute(r.getTimestamp(0)))
    }

    // global: one merged summary across all cells — the theorem must
    // survive the re-slice with the SAME n/(k+1) bound
    val mgMerge = udaf(new MisraGries.MgMergeAggS(k), Encoders.BINARY)
    val globalBytes = view.agg(mgMerge($"users_mg")).head().getAs[Array[Byte]](0)
    val global = MisraGries.deserializeS(globalBytes)
    assert(global.size <= k)
    val exactGlobal = exactByMinute.values.flatten
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(exactGlobal.size > k, "test must exercise truncation")
    assertGuarantee(global, exactGlobal)
  }

  test("overlapping-minute upsert merges cell summaries instead of replacing them") {
    val dir = tmpDir("rollup-mg2") + "/r"
    val t0 = 1704067200000L
    val b1 = mkEvents(120, t0) // minutes 0-1
    val b2 = mkEvents(120, t0) // SAME minutes: second batch must merge in
    Ingest.upsertHeavyHitterRollup(b1, dir)
    Ingest.upsertHeavyHitterRollup(b2, dir)
    val view = spark.read.parquet(dir)
    // n inside each cell summary equals the cell's cnt — proof the second
    // batch merged (weight accounting) rather than overwrote
    val cells = view.select($"users_mg", $"cnt").collect()
    assert(cells.nonEmpty)
    for (r <- cells) {
      val s = MisraGries.deserializeS(r.getAs[Array[Byte]]("users_mg"))
      assert(s.n === r.getAs[Long]("cnt"),
        "cell summary weight must equal the merged count")
    }
    val totalCnt = view.agg(sum($"cnt")).head().getLong(0)
    assert(totalCnt === 240L)
  }
}
