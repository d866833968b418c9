package graft.streaming

import java.sql.Timestamp

import graft.SparkSuite

/** Cell-served join advisor: the readout merged from two maintained
  * heavy-hitter rollups must keep every one-shot-probe guarantee —
  * exact row counts, theorem bounds sandwiching exact recomputes, the
  * salt flag raised by a hot key above the noise floor — with ZERO
  * scans of either raw side, across incremental multi-batch builds.
  */
class ServedJoinPlanSpec extends SparkSuite {
  import spark.implicits._

  private val T0 = 1704067200000L
  private val K = 64

  private def sideDf(users: Seq[String]) =
    users.zipWithIndex.map { case (u, i) =>
      (new Timestamp(T0 + (i % 30) * 60000L), u)
    }.toDF("event_minute", "user_id")

  private def build(users: Seq[String]): String = {
    val dir = tmpDir("sjp") + "/hh"
    // two incremental batches so the serve crosses a real cell MERGE
    val (b1, b2) = users.zipWithIndex.partition(_._2 % 2 == 0)
    Ingest.upsertHeavyHitterRollup(sideDf(b1.map(_._1)), dir, K)
    Ingest.upsertHeavyHitterRollup(sideDf(b2.map(_._1)), dir, K)
    dir
  }

  private def exact(l: Seq[String], r: Seq[String]): (Long, Long) = {
    val cl = l.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cr = r.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val prods = (cl.keySet ++ cr.keySet).toSeq
      .map(k => cl.getOrElse(k, 0L) * cr.getOrElse(k, 0L))
    (prods.sum, if (prods.isEmpty) 0L else prods.max)
  }

  test("hot key: bounds sandwich exact, salt flag raised, counts exact") {
    val l = Seq.fill(2000)("hot") ++ (1 to 500).flatMap(i => Seq.fill(4)("u" + i))
    val r = Seq.fill(20)("hot") ++ (1 to 500).map("u" + _)
    val s = Ingest.servedJoinPlanSketch(spark, build(l), build(r),
      parallelism = 4, broadcastRows = 10, k = K)
    val (exOut, exMax) = exact(l, r)
    assert(s.nLeft == l.size && s.nRight == r.size, "cell counts exact")
    assert(s.maxKeyOutLo <= exMax && exMax <= s.maxKeyOutHi, s"$s vs $exMax")
    assert(s.outRowsLo <= exOut, s"$s vs $exOut")
    assert(s.strategy == "shuffle" && s.needsSalt, s"hot key must page: $s")
    assert(s.maxKeyOutLo >= exMax / 2, s"hot key visible through cell merge: $s")
    // NDV through HLL-union of cells: within 5% of truth (501 keys)
    assert(math.abs(s.ndvLeft - 501L) <= 25, s"ndv ${s.ndvLeft}")
  }

  test("uniform sides: no salt, broadcast decision exact") {
    val l = (1 to 300).flatMap(i => Seq.fill(3)("u" + i))
    val r = (1 to 300).map("u" + _)
    val s = Ingest.servedJoinPlanSketch(spark, build(l), build(r),
      parallelism = 4, broadcastRows = 500, k = K)
    assert(!s.needsSalt, s"uniform join must not page: $s")
    assert(s.strategy == "broadcast_right", s"300 <= 500 rows: $s")
  }
}
