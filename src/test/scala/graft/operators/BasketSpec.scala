package graft.operators

import graft.SparkSuite

/** Market-basket pair mining (Basket.itemPairs): ground truth on a planted
  * corpus with hand-computed support/confidence/lift, plus shape checks on
  * the real events table. */
class BasketSpec extends SparkSuite {

  test("planted baskets produce the hand-computed pair statistics") {
    import spark.implicits._
    // 4 baskets (same user, 4 days): {a,b}, {a,b}, {a}, {b,c}
    // n_a=3 n_b=3 n_c=1 N=4; pairs: (a,b)=2, (b,c)=1
    // ts stored as epoch MICROS longs — the on-disk contract Tables.events
    // reads (UTC session, so day boundaries are exact)
    val t0 = 1704067200000000L // 2024-01-01 00:00:00 UTC in micros
    def ts(day: Int, i: Int) = t0 + day * 86400000000L + i * 1000000L
    val rows = Seq(
      (1L, ts(0, 0), 7L, "a", 0.0, "{}"), (2L, ts(0, 1), 7L, "b", 0.0, "{}"),
      (3L, ts(1, 0), 7L, "a", 0.0, "{}"), (4L, ts(1, 1), 7L, "b", 0.0, "{}"),
      // duplicate item in a basket must not inflate counts
      (5L, ts(1, 2), 7L, "b", 0.0, "{}"),
      (6L, ts(2, 0), 7L, "a", 0.0, "{}"),
      (7L, ts(3, 0), 7L, "b", 0.0, "{}"), (8L, ts(3, 1), 7L, "c", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("graft-basket")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Basket.itemPairs(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    // support_e4 = 1e4*n_ab/4, confidence_e4 = 1e4*n_ab/n_a,
    // lift_e4 = 1e4*n_ab*4/(n_a*n_b), all floor-divided
    assert(got == Seq(
      ("a", "b", 2L, 5000L, 6666L, 8888L),
      ("b", "c", 1L, 2500L, 3333L, 13333L)))
  }

  test("real-events pairs are symmetric-bounded and support<=confidence") {
    val rows = Basket.itemPairs(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b, s"pair order ($a,$b)")
      val (nab, na, nb) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab <= math.min(na, nb), s"co-count exceeds item count ($a,$b)")
      val (sup, conf) = (r.getLong(5), r.getLong(6))
      assert(sup <= conf, s"support>confidence ($a,$b)") // n_a <= N always
      assert(sup >= 0 && conf <= 10000)
    }
  }
}
