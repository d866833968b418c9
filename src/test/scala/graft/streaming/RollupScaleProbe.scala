package graft.streaming

import org.apache.spark.sql.functions._

/** Scale probe for the maintained minute-cell views: does the per-batch
  * upsert cost actually stay FLAT as total state grows (the claim every
  * `mergeMinuteRollup` caller makes), and what does serving charts from
  * weeks of cells cost?
  *
  * The FIRST run of this probe (minute-grain layout) FALSIFIED the flat
  * claim: 30-min upsert 5.4 s vs 1-day state but 21.0 s vs 14-day state
  * (20,160 dirs — read.parquet and the dynamic-overwrite commit list
  * the whole tree), serves 52-72 s for an 80k-row cell scan. That run
  * motivated mergeMinuteRollup's `partitionGrain` and the M4 view's
  * day-grain default, which this probe now validates: same fixture,
  * upsert cost must stay within 3x across 14x state, serves in seconds.
  *
  * Fixture: 14 days of generated traffic at 100 ev/min (~2M events)
  * built into the M4 rollup by ONE bulk upsert, then a 30-minute
  * incremental batch timed against that state vs against a 1-day state,
  * then servedM4/servedLttb at 4-hour buckets. Findings land in
  * SCALE_NOTES Leg 27.
  *
  *   sbt "Test/runMain graft.streaming.RollupScaleProbe"
  *   RSP_DAYS=2 sbt "Test/runMain ..."   # quicker iteration
  */
object RollupScaleProbe {

  def main(args: Array[String]): Unit = {
    val days = sys.env.getOrElse("RSP_DAYS", "14").toInt
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    val t0 = 1704067200000L // 2024-01-01 UTC
    val evPerMin = 100L
    def traffic(startMs: Long, minutes: Long) =
      graft.reference.Events.withEventMinute(graft.reference.Events.generate(
        spark, minutes * evPerMin, startMs, intervalMs = 60000L / evPerMin))

    def timed[T](what: String)(f: => T): Double = {
      val s = System.nanoTime(); f
      val sec = (System.nanoTime() - s) / 1e9
      println(f"[probe] $what%-34s $sec%8.2f s")
      sec
    }

    def dirsOf(dir: String): Int =
      Option(new java.io.File(dir).listFiles())
        .map(_.count(_.getName.contains("="))).getOrElse(0)

    // small state: 1 day
    val smallDir = java.nio.file.Files.createTempDirectory("m4-small").toString + "/m"
    timed(s"bulk build 1 day (${1440 * evPerMin} ev)")(
      Ingest.upsertM4Rollup(traffic(t0, 1440), smallDir))
    // incremental batch: 30 minutes INSIDE the built range (worst case:
    // every touched partition already exists and must merge)
    def incBatch(baseMs: Long) = traffic(baseMs + 6 * 3600000L, 30)
    val incSmall = timed("30-min upsert vs 1-day state")(
      Ingest.upsertM4Rollup(incBatch(t0), smallDir))

    // large state: `days` days
    val bigDir = java.nio.file.Files.createTempDirectory("m4-big").toString + "/m"
    timed(s"bulk build $days days (${days * 1440 * evPerMin} ev)")(
      Ingest.upsertM4Rollup(traffic(t0, days * 1440L), bigDir))
    val incBig = timed(s"30-min upsert vs $days-day state")(
      Ingest.upsertM4Rollup(incBatch(t0 + (days - 1) * 86400000L), bigDir))

    var m4Pts = 0
    var lttbPts = 0
    timed("servedM4 4h buckets (full range)") {
      m4Pts = Ingest.servedM4(spark, bigDir, 240).collect().length
    }
    timed("servedLttb 4h buckets (full range)") {
      lttbPts = Ingest.servedLttb(spark, bigDir, 240).collect().length
    }
    println(s"[probe] served points: m4=$m4Pts lttb=$lttbPts")

    val (dSmall, dBig) = (dirsOf(smallDir), dirsOf(bigDir))
    println(s"[probe] minute dirs: 1-day state $dSmall, $days-day state $dBig " +
      f"(layout bill extrapolates to ${525600}%d dirs/view-year)")
    println(f"[probe] incremental upsert: ${incSmall}%.2f s vs ${incBig}%.2f s " +
      f"(${days}x state, ratio ${incBig / incSmall}%.2f - flat-cost claim)")
    assert(incBig < incSmall * 3,
      "per-batch upsert cost must not scale with total state")
    spark.stop()
  }
}
