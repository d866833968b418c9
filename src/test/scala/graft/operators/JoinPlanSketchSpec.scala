package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Sketch join advisor: every theorem bound must sandwich an exact
  * recompute (maxKeyOutLo <= true <= maxKeyOutHi, outRowsLo <= true out),
  * the broadcast decision must be exact, a hot key above the n/(k+1)
  * noise floor must raise the salt flag, and a uniform join must not.
  */
class JoinPlanSketchSpec extends SparkSuite {
  import spark.implicits._

  private def keyed(xs: Seq[String]) = xs.toDF("key")

  private def exact(l: Seq[String], r: Seq[String]): (Long, Long) = {
    val cl = l.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = r.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prods = (cl.keySet ++ cr.keySet).toSeq
      .map(k => cl.getOrElse(k, 0L) * cr.getOrElse(k, 0L))
    (prods.sum, if (prods.isEmpty) 0L else prods.max)
  }

  test("planted hot key: bounds sandwich exact, salt flag raised") {
    val l = Seq.fill(2000)("hot") ++ (1 to 500).flatMap(i => Seq.fill(4)("k" + i))
    val r = Seq.fill(20)("hot") ++ (1 to 500).map("k" + _)
    val (exOut, exMax) = exact(l, r)
    val s = Audit.joinPlanSketchFor(keyed(l), keyed(r),
      parallelism = 4, broadcastRows = 10, k = 64)
    assert(s.nLeft == l.size && s.nRight == r.size, "row counts exact")
    assert(s.maxKeyOutLo <= exMax && exMax <= s.maxKeyOutHi,
      s"max bounds [${s.maxKeyOutLo}, ${s.maxKeyOutHi}] vs exact $exMax")
    assert(s.outRowsLo <= exOut, s"outRowsLo ${s.outRowsLo} vs exact $exOut")
    assert(s.strategy == "shuffle" && s.needsSalt,
      s"2000x20 hot key must page: $s")
    // the hot key clears the noise floor by >10x, so the lower bound
    // itself must already be most of the true product
    assert(s.maxKeyOutLo >= exMax / 2, s"hot key visible: $s vs $exMax")
  }

  test("uniform keys: no salt, near-exact when k exceeds the key space") {
    val l = (1 to 200).flatMap(i => Seq.fill(3)("k" + i))
    val r = (1 to 200).map("k" + _)
    val (exOut, exMax) = exact(l, r)
    val s = Audit.joinPlanSketchFor(keyed(l), keyed(r),
      parallelism = 4, broadcastRows = 10, k = 256)
    // k = 256 > 200 distinct keys: Misra-Gries never decrements, so the
    // tracked estimates are exact and the lower bounds collapse to truth
    assert(s.outRowsLo == exOut && s.maxKeyOutLo == exMax, s"$s")
    assert(!s.needsSalt, s"uniform join must not page: $s")
  }

  test("broadcast decision is exact; real data agrees with the exact advisor") {
    val ev = graft.Tables.events(spark, Sf)
    val l = ev.filter($"event_type" === "view")
      .select($"user_id".cast("string").as("key"))
    val r = ev.filter($"event_type" === "purchase")
      .select($"user_id".cast("string").as("key"))
    val s = Audit.joinPlanSketchFor(l, r)
    val exactRow = Audit.joinPlanFor(l, r, "x").collect().head
    assert(s.strategy == exactRow.getAs[String]("strategy"),
      "broadcast decision uses exact row counts, must agree")
    assert(s.nLeft == exactRow.getAs[Long]("left_rows"))
    assert(s.nRight == exactRow.getAs[Long]("right_rows"))
    assert(s.outRowsLo <= exactRow.getAs[Long]("out_rows"))
    assert(s.maxKeyOutLo <= exactRow.getAs[Long]("max_key_out") &&
      exactRow.getAs[Long]("max_key_out") <= s.maxKeyOutHi)
  }
}
