package graft.streaming

import graft.reference.Events

/** Scale probe for the health-report SERVE path: the alerting loop
  * re-serves the report every few minutes forever, so its cost must be
  * O(rollup cells aggregated distributedly) with only O(types) rows ever
  * reaching the driver — not O(events) and not O(cells) on the driver.
  * HealthReportSpec proves correctness on ~70 cells; this drives the
  * same serve over a month-scale view (≈33k minute cells per rollup from
  * 4M events) and times the steady-state re-serve. Findings in
  * SCALE_NOTES Leg 25.
  *
  *   sbt "Test/runMain graft.streaming.HealthServeProbe"
  *   HEALTH_EVENTS=1000000 sbt "Test/runMain ..."   # quicker iteration
  */
object HealthServeProbe {

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("HEALTH_EVENTS", "4000000").toLong
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val t0 = 1704067200000L
    val base = java.nio.file.Files.createTempDirectory("health-probe").toString
    val (qDir, hDir, cDir) = (base + "/q", base + "/hh", base + "/c")

    // one month-scale build: n events at 1 s spacing ≈ n/60 minute cells
    def timed(f: => Unit): Double = {
      val s = System.nanoTime(); f; (System.nanoTime() - s) / 1e9
    }
    val half = n / 2
    val tBuild = timed {
      Seq(
        Events.generate(spark, half, t0, intervalMs = 1000),
        Events.generate(spark, n - half, t0 + half * 1000L, intervalMs = 1000,
          errorProb = 0.4)
      ).foreach { b =>
        val e = Events.withEventMinute(b).localCheckpoint()
        Ingest.upsertQuantileRollup(e, qDir)
        Ingest.upsertHeavyHitterRollup(e, hDir)
        Ingest.upsertRollup(e, cDir)
      }
    }
    val cells = spark.read.parquet(qDir).count()
    val split = new java.sql.Timestamp(t0 + half * 1000L)

    def serveOnce(): Long = HealthReport.serve(spark, qDir, hDir, split,
      countRollupDir = Some(cDir)).count()
    serveOnce() // untimed warm-up (codegen + file listing)
    val walls = (1 to 3).map(_ => timed(serveOnce())).sorted
    val rows = serveOnce()

    // sanity: the planted second-half error-prob jump must page
    val fired = HealthReport.serve(spark, qDir, hDir, split,
      countRollupDir = Some(cDir))
      .filter(org.apache.spark.sql.functions.col("metric") === "error_rate")
      .filter(org.apache.spark.sql.functions.col("alert"))
      .count()
    require(fired == 5, s"expected all 5 types to page on error_rate, got $fired")

    println(f"[healthserve] events=$n%,d cells=$cells%,d build=$tBuild%.1f s  " +
      f"serve med=${walls(1)}%.2f s [${walls.head}%.2f, ${walls.last}%.2f]  " +
      s"report_rows=$rows  error_rate paging: OK")
    spark.stop()
  }
}
