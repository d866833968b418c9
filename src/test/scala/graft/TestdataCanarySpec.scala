package graft

import org.apache.spark.sql.functions._

/** Canary for driver-regenerated testdata. Round 8 regenerated
  * /root/testdata with `events.ts` switched from TIMESTAMP(NANOS) to
  * TIMESTAMP(MICROS); the nanos-only reader silently collapsed all event
  * times 1000× and broke 18 oracle queries with nothing pointing at the
  * cause. This suite pins the CONTRACT the engine assumes about each
  * table — logical schema through the Tables readers, plus the physical
  * value ranges that distinguish unit/scale drift — so the next
  * regeneration that moves the format fails HERE, by name, instead of 18
  * queries deep in the correctness gate.
  */
class TestdataCanarySpec extends SparkSuite {

  import spark.implicits._

  test("every table loads with its declared schema at every sf") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1");
         t <- Seq("region", "nation", "customer", "supplier", "part",
           "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = Tables.load(spark, s"/root/testdata/$sf", t)
      assert(df.limit(1).count() === 1, s"$sf/$t unreadable or empty")
    }
  }

  test("events.ts normalizes to a sane era regardless of physical unit") {
    // The per-value unit detection (Tables.events) must land every
    // timestamp in a plausible era — 2020..2032 — whether the parquet
    // carries nanos or micros. A 1000× collapse (the round-8 incident)
    // lands decades away and fails here by name.
    val r = Tables.events(spark, Sf)
      .agg(min($"ts").as("lo"), max($"ts").as("hi"),
        count(lit(1)).as("n")).head()
    val (lo, hi) = (r.getTimestamp(0), r.getTimestamp(1))
    val era2020 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val era2032 = java.sql.Timestamp.valueOf("2032-01-01 00:00:00")
    assert(lo.after(era2020) && hi.before(era2032),
      s"events.ts range [$lo, $hi] is outside the plausible era — " +
        "physical timestamp unit likely changed AGAIN (see Tables.events)")
    // and the span is a real multi-day window, not a collapsed sliver
    val spanHours = (hi.getTime - lo.getTime) / 3600000.0
    assert(spanHours > 24.0,
      f"events span $spanHours%.1f h — unit collapse suspected")
  }

  test("embeddings are 64-dim with finite floats; documents texts non-empty") {
    val e = Tables.embeddings(spark, Sf)
      .select(size($"embedding").as("d"),
        exists($"embedding", x => x.isNull || isnan(x) ||
          abs(x) > lit(1e6f)).as("bad"))
      .agg(min($"d"), max($"d"), sum(when($"bad", 1L).otherwise(0L))).head()
    assert(e.getInt(0) === 64 && e.getInt(1) === 64,
      s"embedding dim drifted: ${e.getInt(0)}..${e.getInt(1)}")
    assert(e.getLong(2) === 0, s"${e.getLong(2)} embeddings carry null/NaN/huge values")
    val d = Tables.documents(spark, Sf)
      .agg(sum(when(length($"text") === 0 || $"text".isNull, 1L)
        .otherwise(0L))).head().getLong(0)
    assert(d === 0, s"$d empty document texts")
  }

  test("scale factors actually scale (events row counts)") {
    val counts = Seq("sf0.001", "sf0.01", "sf0.1").map { sf =>
      sf -> Tables.events(spark, s"/root/testdata/$sf").count()
    }.toMap
    assert(counts("sf0.001") === 1000L,
      s"sf0.001 events = ${counts("sf0.001")} — Golden.SfEvents dispatch breaks")
    assert(counts("sf0.01") === 10000L,
      s"sf0.01 events = ${counts("sf0.01")} — Golden.SfEvents dispatch breaks")
    assert(counts("sf0.1") === 100000L,
      s"sf0.1 events = ${counts("sf0.1")} — Golden.SfEvents dispatch breaks")
  }
}
