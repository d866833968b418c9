package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.reference.Events

/** Maintained M4 rollup: extremes must merge exactly — incremental
  * upserts serve the identical series to a one-shot build over the union
  * at every bucket width — and the served points must be the true
  * first/last/min/max of the raw data (planted spike survives, endpoints
  * verbatim, role bitmask partitions 1+2+4+8 per bucket).
  */
class M4RollupSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1704067200000L // 2024-01-01 00:00 UTC

  private def batch(n: Int, startMs: Long) =
    Events.withEventMinute(Events.generate(spark, n, startMs))

  test("incremental == one-shot at minute, hour, and 6h grains") {
    val incDir = tmpDir("m4-inc") + "/m"
    val oneDir = tmpDir("m4-one") + "/m"
    // three batches spanning ~3 hours, the middle one re-touching
    // minutes of the first (out-of-order arrival)
    val b1 = batch(1500, T0)
    val b2 = batch(1500, T0 + 30 * 60000L)
    val b3 = batch(1500, T0 + 120 * 60000L)
    Seq(b1, b2, b3).foreach(Ingest.upsertM4Rollup(_, incDir))
    Ingest.upsertM4Rollup(b1.unionByName(b2).unionByName(b3), oneDir)
    for (w <- Seq(1, 60, 360)) {
      val inc = Ingest.servedM4(spark, incDir, w).collect().toSeq
      val one = Ingest.servedM4(spark, oneDir, w).collect().toSeq
      assert(inc == one, s"width $w: incremental serve must equal one-shot")
      val incL = Ingest.servedLttb(spark, incDir, w).collect().toSeq
      val oneL = Ingest.servedLttb(spark, oneDir, w).collect().toSeq
      assert(incL == oneL, s"width $w: incremental LTTB serve must equal one-shot")
    }
  }

  test("served LTTB: endpoints exact, planted spike wins its interior bucket") {
    val dir = tmpDir("m4-lttb") + "/m"
    val u = "0123abcd-0000-4000-8000-0123456789ab"
    def row(offsetSec: Int, lat: Int) =
      (u, u, u, "SEARCH", new Timestamp(T0 + offsetSec * 1000L), lat,
        "SUCCESS", Option.empty[Int], Option.empty[Int])
    // three hour-buckets: flat 100s except a 9999 spike mid-hour-1
    val rows = Seq(row(120, 100), row(1800, 100),
      row(3700, 100), row(5400, 9999), row(6900, 100),
      row(7300, 100), row(10500, 100))
    val df = Events.withEventMinute(rows.toDF("event_id", "user_id",
        "session_id", "event_type", "event_timestamp", "request_latency_ms",
        "status", "error_code", "product_id")
      .withColumn("error_code", col("error_code").cast("int"))
      .withColumn("product_id", col("product_id").cast("int")))
    Ingest.upsertM4Rollup(df, dir)
    val served = Ingest.servedLttb(spark, dir, 60).collect()
      .map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("sel_t_us"), r.getAs[Double]("sel_value")))).toMap
    def us(off: Int) = (T0 / 1000 + off) * 1000000L
    assert(served.size == 3, s"one point per bucket: $served")
    val buckets = served.keys.toSeq.sorted
    assert(served(buckets.head) == ((us(120), 100.0)), "first endpoint verbatim")
    assert(served(buckets.last) == ((us(10500), 100.0)), "last endpoint verbatim")
    assert(served(buckets(1)) == ((us(5400), 9999.0)), "spike wins the interior bucket")
  }

  test("served LTTB area is >=95% of the best RAW point's in every interior bucket") {
    val dir = tmpDir("m4-lttb-q") + "/m"
    val b = batch(3000, T0) // ~50 minutes of events
    Ingest.upsertM4Rollup(b, dir)
    val w = 10 // 10-minute buckets -> ~5 buckets, >=3 interior
    val served = Ingest.servedLttb(spark, dir, w).collect()
      .map(r => (r.getString(0), r.getAs[Long]("bucket")) ->
        ((r.getAs[Long]("sel_t_us"), r.getAs[Double]("sel_value")))).toMap
    val raw = b.filter($"request_latency_ms".isNotNull)
      .select($"event_type",
        expr(s"unix_timestamp(event_minute) div ${w * 60}").as("bucket"),
        unix_micros($"event_timestamp").as("t"),
        $"request_latency_ms".cast("double").as("v"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.map(r => (r.getLong(2), r.getDouble(3))).toSeq).toMap
    def mean(k: (String, Long)): (Double, Double) = {
      val pts = raw(k)
      (pts.map(_._1.toDouble / 1e6).sum / pts.size,
        pts.map(_._2).sum / pts.size)
    }
    raw.keys.groupBy(_._1).foreach { case (tpe, ks) =>
      val bs = ks.map(_._2).toSeq.sorted
      for (bk <- bs.drop(1).dropRight(1)) {
        val k = (tpe, bk)
        if (raw.contains((tpe, bk - 1)) && raw.contains((tpe, bk + 1))) {
          val (ax, ay) = mean((tpe, bk - 1)); val (cx, cy) = mean((tpe, bk + 1))
          def areaOf(t: Long, v: Double) =
            math.abs((ax - cx) * (v - ay) - (ax - t.toDouble / 1e6) * (cy - ay))
          val best = raw(k).map { case (t, v) => areaOf(t, v) }.max
          val (st, sv) = served(k)
          assert(areaOf(st, sv) >= 0.95 * best,
            s"$k: served area ${areaOf(st, sv)} vs best $best")
        }
      }
    }
  }

  test("schema/grain drift in an existing state directory fails with the remedy named") {
    val dir = tmpDir("m4-drift") + "/m"
    // simulate state written by an older engine version: same partition
    // layout idea, different cell schema
    batch(200, T0).groupBy($"event_minute", $"event_type")
      .agg(count(lit(1)).as("cnt"))
      .write.partitionBy("event_minute").parquet(dir)
    val e = intercept[IllegalStateException] {
      Ingest.upsertM4Rollup(batch(200, T0), dir)
    }
    assert(e.getMessage.contains("rebuild the state"), e.getMessage)
    assert(e.getMessage.contains(dir), "error must name the directory")
  }

  test("served points are the true extremes of the raw data") {
    val dir = tmpDir("m4-truth") + "/m"
    val b = batch(3000, T0) // ~50 minutes of events
    Ingest.upsertM4Rollup(b, dir)
    val served = Ingest.servedM4(spark, dir, 60).collect()
    val raw = b.filter($"request_latency_ms".isNotNull)
      .select($"event_type",
        expr("unix_timestamp(event_minute) div 3600").as("bucket"),
        unix_micros($"event_timestamp").as("t"),
        $"request_latency_ms".cast("double").as("v"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    served.groupBy(r => (r.getString(0), r.getAs[Long]("bucket"))).foreach {
      case (k, rs) =>
        val pts = raw(k).map(r => (r.getLong(2), r.getDouble(3)))
        val vs = rs.map(r => (r.getAs[Long]("sel_t_us"), r.getAs[Double]("sel_value"),
          r.getAs[Int]("roles")))
        assert(rs.map(_.getAs[Int]("roles")).sum == 15, s"$k roles partition 1+2+4+8")
        assert(rs.length <= 4, s"$k at most 4 points")
        def withRole(bit: Int) = vs.filter(p => (p._3 & bit) != 0)
        assert(withRole(1).head._1 == pts.map(_._1).min, s"$k first by time")
        assert(withRole(2).head._1 == pts.map(_._1).max, s"$k last by time")
        assert(withRole(4).head._2 == pts.map(_._2).min, s"$k min value")
        assert(withRole(8).head._2 == pts.map(_._2).max, s"$k max value")
        assert(rs.map(_.getAs[Long]("cnt")).distinct.length == 1 &&
          rs.head.getAs[Long]("cnt") == pts.length, s"$k cnt")
    }
  }

  test("planted spike and endpoints survive the serve; replay keeps extremes") {
    val dir = tmpDir("m4-spike") + "/m"
    val u = "0123abcd-0000-4000-8000-0123456789ab"
    def row(offsetSec: Int, lat: Int) =
      (u, u, u, "SEARCH", new Timestamp(T0 + offsetSec * 1000L), lat,
        "SUCCESS", Option.empty[Int], Option.empty[Int])
    // one hour bucket: first at 0s (lat 100), spike 9999 at 500s,
    // dip 1 at 900s, last at 3500s (lat 200)
    val rows = Seq(row(0, 100), row(500, 9999), row(900, 1), row(3500, 200))
    val df = Events.withEventMinute(rows.toDF("event_id", "user_id",
        "session_id", "event_type", "event_timestamp", "request_latency_ms",
        "status", "error_code", "product_id")
      .withColumn("error_code", col("error_code").cast("int"))
      .withColumn("product_id", col("product_id").cast("int")))
    Ingest.upsertM4Rollup(df, dir)
    Ingest.upsertM4Rollup(df, dir) // replay: extremes must be a no-op
    val served = Ingest.servedM4(spark, dir, 60).collect()
      .map(r => r.getAs[Long]("sel_t_us") -> r.getAs[Int]("roles")).toMap
    assert(served == Map(
      (T0 / 1000) * 1000000L -> 1,
      (T0 / 1000 + 500) * 1000000L -> 8,
      (T0 / 1000 + 900) * 1000000L -> 4,
      (T0 / 1000 + 3500) * 1000000L -> 2))
  }
}
