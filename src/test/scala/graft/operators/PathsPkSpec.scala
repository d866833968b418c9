package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Clickstream path mining (EventOps.topPaths) and PK-uniqueness census
  * (Audit.primaryKeys): planted ground truths. */
class PathsPkSpec extends SparkSuite {

  test("planted sessions produce ordered, truncated, counted paths") {
    import spark.implicits._
    val t0 = 1704067200000000L // 2024-01-01 UTC micros
    def ev(id: Long, user: Long, day: Int, sec: Int, t: String) =
      (id, t0 + day * 86400000000L + sec * 1000000L, user, t, 0.0, "{}")
    // user 1 day 0: view>click>purchase; user 2 day 0: view>click>purchase;
    // user 1 day 1: error; user 3 day 0: 10 clicks -> truncated to 8
    val rows = (Seq(
      ev(1, 1, 0, 1, "view"), ev(2, 1, 0, 2, "click"), ev(3, 1, 0, 3, "purchase"),
      ev(4, 2, 0, 1, "view"), ev(5, 2, 0, 2, "click"), ev(6, 2, 0, 3, "purchase"),
      ev(7, 1, 1, 1, "error")) ++
      (1 to 10).map(i => ev(100 + i, 3, 0, i, "click")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("graft-paths")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.topPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val eight = Seq.fill(8)("click").mkString(">")
    assert(got == Seq(
      ("view>click>purchase", 2L), (eight, 1L), ("error", 1L)).sortBy {
        case (p, n) => (-n, p) })
  }

  test("path order comes from event time with event_id tiebreak") {
    import spark.implicits._
    val t0 = 1704067200000000L
    // same timestamp: event_id 2 then 3 must order deterministically
    val rows = Seq(
      (3L, t0 + 1000000L, 1L, "b", 0.0, "{}"),
      (2L, t0 + 1000000L, 1L, "a", 0.0, "{}"),
      (1L, t0, 1L, "start", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = tmpDir("graft-paths2")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventOps.topPaths(spark, dir).head().getString(0)
    assert(got == "start>a>b")
  }

  test("pk census counts planted duplicate keys exactly") {
    import spark.implicits._
    val t = Seq((1L, "x"), (2L, "y"), (2L, "z"), (2L, "w"), (3L, "v"))
      .toDF("k", "v")
    val r = Audit.primaryKeyCensus("t(k)", t, Seq("k")).head()
    assert(r.getString(0) == "t(k)")
    assert(r.getLong(1) == 5L, "n_rows")
    assert(r.getLong(2) == 3L, "n_keys")
    assert(r.getLong(3) == 3L, "n_dup_rows: the three k=2 rows")
    assert(r.getLong(4) == 3L, "max multiplicity")
    assert(!r.getBoolean(5))
  }

  test("census verdicts on the generated star schema — incl. the real violation") {
    val rows = Audit.primaryKeys(spark, Sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.size == 10)
    // the generator does NOT enforce TPC-H's composite lineitem key:
    // (l_orderkey, l_linenumber) collides up to 5x — a genuine violation
    // the census must surface (this is the non-vacuous case)
    val li = rows("lineitem(l_orderkey,l_linenumber)")
    assert(!li.getBoolean(5) && li.getLong(3) > 0 && li.getLong(4) >= 2)
    assert(li.getLong(1) > li.getLong(2), "rows must exceed distinct keys")
    // every single-column surrogate key is clean
    (rows - "lineitem(l_orderkey,l_linenumber)").values.foreach { r =>
      assert(r.getBoolean(5), s"${r.getString(0)} has duplicate keys")
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)} rows != keys")
    }
  }
}
