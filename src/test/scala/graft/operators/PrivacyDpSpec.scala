package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** ε-DP histogram release (Audit.dpHistogram): the seeded Laplace draw is
  * re-derived from first principles in plain Scala and compared exactly;
  * determinism and ε-scaling are pinned. */
class PrivacyDpSpec extends SparkSuite {

  /** Reference implementation of the engine's deterministic draw. */
  private def laplaceNoise(key: String, seed: String, b: Double): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest((key + ":" + seed).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / math.pow(16.0, 15)
    -b * math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
  }

  test("noisy counts equal exact count + the closed-form seeded draw") {
    val exact = Tables.events(spark, Sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Audit.dpHistogram(spark, Sf).collect()
    assert(got.map(_.getString(0)).toSet == exact.keySet)
    got.foreach { r =>
      val k = r.getString(0)
      val want = BigDecimal(exact(k) + laplaceNoise(k, "dp42", 2.0))
        .setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(1) == want, s"type $k")
      assert(r.getDouble(2) == 0.5)
    }
  }

  test("the release is deterministic and epsilon scales the noise") {
    val a = Audit.dpHistogram(spark, Sf).collect().toSeq
    val b = Audit.dpHistogram(spark, Sf).collect().toSeq
    assert(a == b, "two releases of the same seed differ")
    // smaller epsilon (stronger privacy) must scale every |noise| up 4x
    val exact = Tables.events(spark, Sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val tight = Audit.dpHistogram(spark, Sf, epsilon = 0.125).collect()
    tight.foreach { r =>
      val k = r.getString(0)
      val n05 = a.find(_.getString(0) == k).get.getDouble(1) - exact(k)
      val n0125 = r.getDouble(1) - exact(k)
      assert(math.abs(n0125 - 4.0 * n05) < 0.02,
        s"type $k: noise at eps=0.125 ($n0125) is not 4x eps=0.5 ($n05)")
    }
  }
}
