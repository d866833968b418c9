package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** The streaming PSI monitor: windows close on the watermark, a
  * reference-shaped minute scores near zero, a drifted minute scores
  * high, and every emitted value equals a plain-Scala recomputation. */
class DriftStreamSpec extends SparkSuite {

  private def ts(min: Long, s: Long = 0) =
    new java.sql.Timestamp(1704067200000L + min * 60000 + s * 1000)

  // reference: uniform 10 x 40 counts
  private val Ref = Seq.fill(10)(40L)

  private def psiOf(counts: Seq[Long]): Double = {
    val (ta, tb) = (counts.sum.toDouble, Ref.sum.toDouble)
    val raw = (0 until 10).map { b =>
      val p = (counts(b) + 1.0) / (ta + 10.0)
      val q = (Ref(b) + 1.0) / (tb + 10.0)
      (p - q) * math.log(p / q)
    }.sum
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("reference-shaped minute ~ 0; drifted minute high; exact values") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, Double)]
    val out = DriftStream.windowedPsi(
      in.toDS().toDF("ts", "value"), Ref, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("psi_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // minute 0: 2 events per bin (reference-shaped); minute 1: all mass
      // in bin 9 (heavy drift)
      val m0 = (0 until 10).flatMap(b =>
        Seq.fill(2)((ts(0, b.toLong), b * 50.0 + 10.0)))
      val m1 = (0 until 20).map(i => (ts(1, i.toLong), 480.0))
      in.addData(m0 ++ m1: _*)
      q.processAllAvailable()
      // advance the watermark past both minutes
      in.addData((ts(5), 10.0))
      q.processAllAvailable()

      val got = spark.table("psi_out")
        .select("window_start", "n_events", "psi")
        .as[(java.sql.Timestamp, Long, Double)].collect()
        .map(r => r._1.getTime -> (r._2, r._3)).toMap
      assert(got.keySet == Set(ts(0).getTime, ts(1).getTime), got)
      val (n0, psi0) = got(ts(0).getTime)
      val (n1, psi1) = got(ts(1).getTime)
      assert(n0 == 20 && n1 == 20)
      assert(psi0 == psiOf(Seq.fill(10)(2L)), s"$psi0")
      assert(psi1 == psiOf(Seq.tabulate(10)(b => if (b == 9) 20L else 0L)), s"$psi1")
      assert(psi0 < 0.01 && psi1 > 1.0, s"$psi0 / $psi1")
    } finally q.stop()
  }
}
