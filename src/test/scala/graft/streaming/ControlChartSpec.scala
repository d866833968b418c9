package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** The streaming CUSUM must emit the exact trajectory of the batch
  * recursion when fed the same events — bucket finalization order and
  * state carry-over across micro-batches included. */
class ControlChartSpec extends SparkSuite {

  private def ts(hour: Int, min: Int = 0) =
    new java.sql.Timestamp(1704067200000L + hour * 3600000L + min * 60000L)

  test("streaming cusum: trajectory identical to the hand recursion, alarm on shift") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // calibration: mu = 2, sigma = 1 → muK = 2.5, h = 4
    // per-hour counts: quiet 2,2,2 then shifted 5,5,5
    //   S: 0, 0, 0, 2.5, 5.0(alarm), 7.5(alarm)
    val params = Map("a" -> (2.0, 1.0))
    val in = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = ControlChart.cusumHourly(
      in.toDS().toDF("event_id", "event_type", "ts"), params,
      watermark = "0 seconds")
    val q = out.writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      val counts = Seq(2, 2, 2, 5, 5, 5)
      var id = 0L
      // feed hour by hour in separate batches so state must carry over
      counts.zipWithIndex.foreach { case (n, h) =>
        val evs = (0 until n).map { i => id += 1; (id, "a", ts(h, i)) }
        in.addData(evs: _*)
        q.processAllAvailable()
      }
      // sentinel far ahead on a different key closes every window
      in.addData((9999L, "zz", ts(1000)))
      q.processAllAvailable()
      in.addData((9998L, "zz", ts(1001)))
      q.processAllAvailable()

      val got = spark.table("cusum_out")
        .as[(String, java.sql.Timestamp, Double, Double, Int)]
        .collect().filter(_._1 == "a").sortBy(_._2.getTime)
      val want = Seq( // (x, s, alarm)
        (2.0, 0.0, 0), (2.0, 0.0, 0), (2.0, 0.0, 0),
        (5.0, 2.5, 0), (5.0, 5.0, 1), (5.0, 7.5, 1))
      assert(got.length === want.length, s"got ${got.toSeq}")
      got.zip(want).foreach { case ((_, hr, x, s, a), (wx, ws, wa)) =>
        assert(x === wx, s"$hr x")
        assert(math.abs(s - ws) < 1e-12, s"$hr cusum: got $s want $ws")
        assert(a === wa, s"$hr alarm")
      }
    } finally q.stop()
  }
}
