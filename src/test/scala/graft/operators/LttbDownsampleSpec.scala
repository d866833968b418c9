package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Fixed-anchor LTTB downsampling: first/last points survive verbatim,
  * the interior keeps the largest-triangle point (a planted spike MUST
  * survive; a flat run collapses to any one point deterministically),
  * bucket membership is exact int64 arithmetic, and the real-data run is
  * a genuine decimation with every bucket represented once.
  */
class LttbDownsampleSpec extends SparkSuite {
  import spark.implicits._

  private def series(points: Seq[(Long, Double)], tpe: String = "a") =
    points.zipWithIndex.map { case ((sec, v), i) =>
      (tpe, new Timestamp(sec * 1000L), v, i.toLong)
    }.toDF("event_type", "ts", "value", "event_id")

  test("planted spike survives; endpoints kept verbatim; flat runs collapse") {
    // 16 points over 16s, flat at 1.0 except a spike 100.0 at t=9s.
    // 4 buckets of 4 points: bucket 0 -> first point, bucket 3 -> last,
    // bucket 2 holds the spike and must select it over its flat siblings.
    val pts = (0L until 16L).map(sec => sec -> (if (sec == 9) 100.0 else 1.0))
    val out = Timeseries.lttbDownsampleOf(series(pts), 4)
      .collect().map(r => r.getAs[Long]("bucket") ->
        ((r.getAs[Long]("sel_t_us"), r.getAs[Double]("sel_value"), r.getAs[Long]("n_pts"))))
      .toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(0)._1 == 0L && out(0)._2 == 1.0, "first bucket keeps the first point")
    assert(out(3)._1 == 15000000L && out(3)._2 == 1.0, "last bucket keeps the last point")
    assert(out(2)._2 == 100.0 && out(2)._1 == 9000000L, "spike must survive decimation")
    // bucket 1 is flat but its NEXT anchor (bucket 2's mean) is pulled up
    // by the spike: area grows linearly toward it -> latest point wins
    assert(out(1)._1 == 7000000L, "flat bucket leans toward the rising anchor")
    assert(out.values.map(_._3).sum == 16L, "bucket sizes partition the series")
  }

  test("a fully flat series ties every area at 0 and breaks ties on (t, id)") {
    val pts = (0L until 12L).map(_ -> 1.0)
    val out = Timeseries.lttbDownsampleOf(series(pts), 3)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("sel_t_us")).toMap
    // buckets of secs 0-3 / 4-7 / 8-11: endpoints verbatim, interior earliest
    assert(out == Map(0L -> 0L, 1L -> 4000000L, 2L -> 11000000L))
  }

  test("the selected interior point maximizes the triangle area vs recompute") {
    // irregular values so the argmax is non-trivial and unique
    val vals = Seq(5.0, 2.0, 9.0, 4.0, 7.0, 1.0, 8.0, 3.0, 6.0, 2.5, 4.5, 0.5)
    val pts = vals.zipWithIndex.map { case (v, i) => i.toLong -> v }
    val nB = 4
    val out = Timeseries.lttbDownsampleOf(series(pts), nB).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("sel_t_us")).toMap
    // plain-Scala recompute of the fixed-anchor rule for bucket 1 and 2
    val n = vals.length
    val mx = (n - 1) * 1000000L
    def bucketOf(tUs: Long): Long = (tUs * nB) / (mx + 1)
    val byB = pts.groupBy { case (sec, _) => bucketOf(sec * 1000000L) }
    def mean(b: Long): (Double, Double) = {
      val xs = byB(b)
      (xs.map(_._1.toDouble).sum / xs.size, xs.map(_._2).sum / xs.size)
    }
    for (b <- 1L to 2L) {
      val (ax, ay) = mean(b - 1); val (cx, cy) = mean(b + 1)
      val best = byB(b).maxBy { case (sec, v) =>
        (math.abs((ax - cx) * (v - ay) - (ax - sec.toDouble) * (cy - ay)),
          -sec)
      }
      assert(out(b) == best._1 * 1000000L, s"bucket $b argmax")
    }
  }

  test("M4: four distinct roles keep four points; shared roles dedupe with a bitmask") {
    // bucket 0 (secs 0-3): first/max/min/last are four DIFFERENT points;
    // bucket 1 (secs 4-7): flat — first doubles as min, last doubles as max
    val pts = Seq(0L -> 2.0, 1L -> 9.0, 2L -> 1.0, 3L -> 5.0,
      4L -> 3.0, 5L -> 3.0, 6L -> 3.0, 7L -> 3.0)
    val out = Timeseries.m4DownsampleOf(series(pts), 2).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("sel_t_us")) ->
        r.getAs[Int]("roles")).toMap
    assert(out == Map(
      (0L, 0L) -> 1, (0L, 3000000L) -> 2, (0L, 2000000L) -> 4, (0L, 1000000L) -> 8,
      (1L, 4000000L) -> (1 + 4), (1L, 7000000L) -> (2 + 8)))
  }

  test("M4 is error-free for extremes: bucket min/max/first/last all survive") {
    val sel = Timeseries.m4Downsample(spark, Sf)
    val rows = sel.collect()
    // at most 4 points per bucket, roles nonzero
    rows.groupBy(r => (r.getString(0), r.getAs[Long]("bucket"))).foreach {
      case (k, rs) =>
        assert(rs.length <= 4, s"$k kept ${rs.length} > 4 points")
        assert(rs.map(_.getAs[Int]("roles")).sum == 15, s"$k roles must partition 1+2+4+8")
    }
    // the kept values bracket the raw data: global min/max per type survive
    val raw = graft.Tables.events(spark, Sf)
      .filter($"ts".isNotNull && $"value".isNotNull)
      .groupBy($"event_type").agg(min($"value").as("mnv"), max($"value").as("mxv"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.groupBy(_.getString(0)).foreach { case (tpe, rs) =>
      val vs = rs.map(_.getAs[Double]("sel_value"))
      assert(vs.min == raw(tpe)._1 && vs.max == raw(tpe)._2,
        s"$tpe extremes must survive M4")
    }
  }

  test("real data: one point per non-empty bucket, counts partition the table") {
    val df = Timeseries.lttbDownsample(spark, Sf)
    val rows = df.collect()
    val total = graft.Tables.events(spark, Sf)
      .filter($"ts".isNotNull && $"value".isNotNull).count()
    assert(rows.map(_.getAs[Long]("n_pts")).sum == total,
      "every input point lands in exactly one bucket")
    val perType = rows.groupBy(_.getString(0))
    perType.foreach { case (tpe, rs) =>
      assert(rs.map(_.getAs[Long]("bucket")).distinct.length == rs.length,
        s"$tpe: one selected point per bucket")
      assert(rs.length <= 48, s"$tpe: at most 48 points out")
      assert(rs.length >= 2, s"$tpe: endpoints survive")
    }
    // windows are partitioned; no single-partition exchange may appear
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"no global sort/window:\n$plan")
  }
}
