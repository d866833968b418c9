package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Mergeable HLL distinct-count rollup (Hll.scala): exact regime vs the
  * oracle shape, sketch-bytes parquet round-trip, re-slicing from the same
  * persisted grain, and the approximate regime's error + size bounds. */
class HllSpec extends SparkSuite {

  test("hll daily users matches exact countDistinct in the coupon regime") {
    val got = Hll.hllDailyUsers(spark, Sf).collect()
    val want = graft.Tables.events(spark, Sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("dau"), count(lit(1)).as("events"))
      .orderBy(col("day")).collect()
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1), s"day ${g.getString(0)} dau")
      assert(g.getLong(2) == w.getLong(2), s"day ${g.getString(0)} events")
    }
  }

  test("trailing 7-day WAU from the rollup matches exact in the coupon regime") {
    val got = Hll.hllTrailingUsers(spark, Sf).collect()
    val ev = graft.Tables.events(spark, Sf)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val days = ev.select(col("day")).distinct()
    val want = days.as("d").join(ev.as("e"),
        col("e.day").between(date_sub(col("d.day"), 6), col("d.day")))
      .groupBy(col("d.day").as("day"))
      .agg(countDistinct(col("e.user_id")).as("wau"),
        count(lit(1)).as("events_7d"))
      .orderBy(col("day")).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getString(0) == w.getDate(0).toString)
      assert(g.getLong(1) == w.getLong(1), s"day ${g.getString(0)} wau")
      assert(g.getLong(2) == w.getLong(2), s"day ${g.getString(0)} events_7d")
    }
    // trailing > daily on interior days (windows only widen coverage)
    val daily = Hll.hllDailyUsers(spark, Sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(r.getLong(1) >= daily(r.getString(0))))
  }

  test("sketch bytes survive a parquet round-trip and re-slice to any grain") {
    val dir = tmpDir("graft-hll-rollup")
    Hll.userSketchRollup(spark, Sf).write.mode("overwrite").parquet(dir)
    val rollup = spark.read.parquet(dir)
    val ev = graft.Tables.events(spark, Sf)

    // coarser grain 1: corpus total from persisted bytes
    val total = rollup
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("users"))
      .head.getLong(0)
    assert(total == ev.agg(countDistinct(col("user_id"))).head.getLong(0))

    // coarser grain 2: per-type distinct users — a slice the (day,type)
    // rollup was not built "for", answered without touching raw events
    val perType = rollup.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("user_sketch"))).as("users"))
      .orderBy(col("event_type")).collect()
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("event_type")).collect()
    perType.zip(exact).foreach { case (g, w) =>
      assert(g.getString(0) == w.getString(0))
      assert(g.getLong(1) == w.getLong(1), s"type ${g.getString(0)}")
    }
  }

  test("approximate regime: 50k ids within 5% at a few KB of state") {
    import spark.implicits._
    val sketch = spark.range(50000).toDF("id")
      .agg(hll_sketch_agg(col("id")).as("s"))
    val est = sketch.select(hll_sketch_estimate(col("s"))).head.getLong(0)
    assert(math.abs(est - 50000L) <= 2500L, s"estimate $est off by >5%")
    // the whole point: state stays KB no matter the cardinality
    val bytes = sketch.select(octet_length(col("s"))).head.getInt(0)
    assert(bytes <= 8192, s"sketch unexpectedly large: $bytes bytes")
  }

  test("inclusion-exclusion overlap discriminates partial overlap (planted)") {
    import spark.implicits._
    // A = users 0..9999, B = users 5000..14999 → |A∩B| = 5000 exactly.
    // (The real events table has every user in every type, so the
    // registered query's intersections are degenerate-full; this fixture
    // proves the readout actually measures overlap.)
    val a = spark.range(0, 10000).select(col("id").as("user_id"))
      .agg(hll_sketch_agg(col("user_id")).as("sk")).head.getAs[Array[Byte]](0)
    val b = spark.range(5000, 15000).select(col("id").as("user_id"))
      .agg(hll_sketch_agg(col("user_id")).as("sk")).head.getAs[Array[Byte]](0)
    val r = Seq((a, b)).toDF("sk_a", "sk_b")
      .select(
        hll_sketch_estimate(col("sk_a")).as("ea"),
        hll_sketch_estimate(col("sk_b")).as("eb"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("eu"))
      .withColumn("ei", greatest(col("ea") + col("eb") - col("eu"), lit(0L)))
      .head()
    val (ea, eb, eu, ei) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(math.abs(ea - 10000) <= 500 && math.abs(eb - 10000) <= 500)
    assert(math.abs(eu - 15000) <= 750, s"union estimate $eu")
    // compounded inclusion-exclusion envelope: 12% of the union
    assert(math.abs(ei - 5000) <= 0.12 * 15000, s"intersect estimate $ei")
  }
}
