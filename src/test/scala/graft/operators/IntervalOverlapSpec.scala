package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

import graft.SparkSuite

/** Interval×interval overlap join: the grid-bucketed construction must
  * agree pair-for-pair with a brute-force nested-loop recompute, across
  * every overlap topology (touching endpoints, containment, zero-length
  * points, multi-cell spans), and must plan as an equi-join — never a
  * cartesian/BNLJ. The production query's burst-impact readout is
  * additionally recomputed from first principles on sf0.001.
  */
class IntervalOverlapSpec extends SparkSuite {
  import spark.implicits._

  private def ts(min: Double): Timestamp =
    new Timestamp((min * 60000.0).round) // minutes since epoch

  // a: id, [start, end] in minutes. Grid = 3600 s = 60 min.
  private val aRows = Seq(
    (1L, 0.0, 59.0),     // inside one cell
    (2L, 50.0, 130.0),   // spans 3 cells
    (3L, 200.0, 200.0),  // zero-length point
    (4L, 300.0, 302.0),
    (5L, 475.0, 500.0))
  private val bRows = Seq(
    (10L, 59.0, 70.0),    // touches a1 at exactly 59.0 → closed overlap
    (11L, 100.0, 115.0),  // inside a2
    (12L, 0.0, 500.0),    // covers everything: shares MANY cells with a2
    (13L, 200.0, 200.0),  // point-on-point with a3
    (14L, 303.0, 310.0))  // disjoint from a4 (gap 1 min)

  private def brute(): Set[(Long, Long)] =
    (for {
      (ai, as_, ae) <- aRows
      (bi, bs, be) <- bRows
      if as_ <= be && bs <= ae
    } yield (ai, bi)).toSet

  test("grid-bucketed overlap join = brute force, each pair exactly once") {
    val a = aRows.map { case (i, s0, e0) => (i, ts(s0), ts(e0)) }
      .toDF("a_id", "a_start", "a_end")
    val b = bRows.map { case (i, s0, e0) => (i, ts(s0), ts(e0)) }
      .toDF("b_id", "b_start", "b_end")
    val got = Temporal.intervalOverlapJoin(a, "a_start", "a_end",
        b, "b_start", "b_end", gridSec = 3600L)
      .select($"a_id", $"b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly once: no multi-cell pair may duplicate (a2 × b12 share 3 cells)
    assert(got.length == got.toSet.size,
      s"pair emitted more than once: ${got.groupBy(identity).filter(_._2.length > 1).keys}")
    assert(got.toSet == brute(),
      s"mismatch: extra=${got.toSet -- brute()}, missing=${brute() -- got.toSet}")
  }

  test("plans as an equi-join on the grid cell, not cartesian/BNLJ") {
    val a = aRows.map { case (i, s0, e0) => (i, ts(s0), ts(e0)) }
      .toDF("a_id", "a_start", "a_end")
    val b = bRows.map { case (i, s0, e0) => (i, ts(s0), ts(e0)) }
      .toDF("b_id", "b_start", "b_end")
    val plan = Temporal.intervalOverlapJoin(a, "a_start", "a_end",
      b, "b_start", "b_end", 3600L).queryExecution.executedPlan
    val bad = plan.collect {
      case c: CartesianProductExec => c
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bad.isEmpty, s"interval join degenerated to ${bad.map(_.nodeName)}")
  }

  test("burst-impact query matches a first-principles recompute (sf0.001)") {
    val got = Temporal.intervalOverlapImpact(spark, Sf).collect()

    // recompute directly: bursts and sessions via independent driver-side code
    val ev = graft.Tables.events(spark, Sf)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000L + r.getTimestamp(3).getNanos / 1000 % 1000))
    val bursts = ev.filter(_._3 == "error")
      .groupBy(e => e._4 / 3600000000L)
      .map { case (h, es) => (h, es.map(_._4).min, es.map(_._4).max, es.length) }
      .filter(_._4 >= 3)
    val sessions = ev.groupBy(_._2).flatMap { case (u, es) =>
      val sorted = es.sortBy(e => (e._4, e._1))
      val buf = scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[Long]]()
      var last = Long.MinValue
      for (e <- sorted) {
        if (buf.isEmpty || e._4 - last > 30L * 60 * 1000000) buf += scala.collection.mutable.ArrayBuffer()
        buf.last += e._4; last = e._4
      }
      buf.map(b => (u, b.min, b.max))
    }
    val expect = bursts.map { case (h, bs, be, ne) =>
      val ov = sessions.filter { case (_, ss, se) => bs <= se && ss <= be }
      val ovUs = ov.map { case (_, ss, se) => math.min(be, se) - math.max(bs, ss) }.sum
      (h, ne.toLong, ov.size.toLong, ov.map(_._1).toSet.size.toLong, ovUs / 1e6)
    }.toSeq.sortBy(_._1)

    assert(got.length == expect.length, s"${got.length} vs ${expect.length} bursts")
    got.zip(expect).foreach { case (g, (_, ne, nsess, nusers, ovSec)) =>
      assert(g.getLong(1) == ne, s"n_errors @ ${g.getString(0)}")
      assert(g.getLong(2) == nsess, s"impacted_sessions @ ${g.getString(0)}")
      assert(g.getLong(3) == nusers, s"impacted_users @ ${g.getString(0)}")
      assert(math.abs(g.getDouble(4) - ovSec) < 1e-6, s"overlap_sec @ ${g.getString(0)}")
    }
  }
}
