package graft.operators

import org.apache.spark.sql.functions._

/** Scale probe for the dashboard decimators (`ev_lttb_downsample` /
  * `ev_m4_downsample`): the sweep runs them on 1M events; a real chart
  * server runs them on the raw history. This drives the SAME plans at
  * 100M points × 5 series (generated narrow maps, no disk staging) and
  * checks the planted ground truth survives: a single spike per series
  * must be selected by both decimators, endpoints verbatim.
  *
  * What the timing isolates: LTTB = one (type, bucket) mean census
  * shuffle + one broadcast join + one partitioned argmax window over
  * (type, bucket) — the window sorts 100M rows but in ~240 independent
  * partitions; M4 = ONE map-side-combinable struct-min/max aggregate,
  * no window at all (the first-cut window formulation measured 63 s
  * here — its four differing sort orders plan as four sorts — and was
  * replaced by the aggregate). Findings land in SCALE_NOTES Leg 26.
  *
  *   sbt "Test/runMain graft.operators.DownsampleProbe"
  *   DS_ROWS=10000000 sbt "Test/runMain ..."   # quicker iteration
  */
object DownsampleProbe {

  def main(args: Array[String]): Unit = {
    // normalize to a multiple of 5 so every series has exactly n/5
    // points and the endpoint asserts hold for any DS_ROWS
    val n = (sys.env.getOrElse("DS_ROWS", "100000000").toLong / 5) * 5
    require(n >= 5000, s"DS_ROWS too small to bucket meaningfully: $n")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val t0us = 1704067200000000L // 2024-01-01 UTC in micros
    val perType = n / 5
    // interior offset derived from the actual series length so the
    // spike exists (and sits mid-series) at any DS_ROWS
    val spikeOff = perType / 2
    // 5 series, 1 point/ms per series; flat-noise values in [0, 100)
    // with one planted spike (v=1e6) per series at a known offset
    def ev = spark.range(n).select(
      concat(lit("s"), ($"id" % 5).cast("string")).as("event_type"),
      timestamp_micros(lit(t0us) + expr("id div 5") * 1000L).as("ts"),
      when(expr("id div 5") === spikeOff, lit(1000000.0))
        .otherwise((pmod(xxhash64($"id"), lit(10000L))).cast("double") / 100.0)
        .as("value"),
      $"id".as("event_id"))

    def timed(what: String)(f: => Array[org.apache.spark.sql.Row]): (Array[org.apache.spark.sql.Row], Double) = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $what%-16s $sec%8.2f s  (${r.length} points out)")
      (r, sec)
    }

    timed("lttb (discard)")(Timeseries.lttbDownsampleOf(ev, 48).collect())
    val lttb = (1 to 3).map(_ => timed("lttb")(Timeseries.lttbDownsampleOf(ev, 48).collect()))
    timed("m4 (discard)")(Timeseries.m4DownsampleOf(ev, 48).collect())
    val m4 = (1 to 3).map(_ => timed("m4")(Timeseries.m4DownsampleOf(ev, 48).collect()))

    // ground truth: the spike survives both decimators in every series;
    // endpoints verbatim
    val spikeT = t0us + spikeOff * 1000L
    for ((rows, what) <- Seq(lttb.head._1 -> "lttb", m4.head._1 -> "m4")) {
      val byType = rows.groupBy(_.getString(0))
      assert(byType.keySet == Set("s0", "s1", "s2", "s3", "s4"))
      byType.foreach { case (tpe, rs) =>
        assert(rs.exists(r => r.getAs[Long]("sel_t_us") == spikeT &&
          r.getAs[Double]("sel_value") == 1000000.0), s"$what $tpe: spike lost")
        val ts = rs.map(_.getAs[Long]("sel_t_us"))
        assert(ts.min == t0us, s"$what $tpe: first endpoint")
        assert(ts.max == t0us + (perType - 1) * 1000L, s"$what $tpe: last endpoint")
      }
    }
    println(f"[probe] rows=$n medians: lttb ${lttb.map(_._2).sorted.apply(1)}%.2f s, " +
      f"m4 ${m4.map(_._2).sorted.apply(1)}%.2f s")
    spark.stop()
  }
}
