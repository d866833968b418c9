package graft.functions

import graft.SparkSuite

/** The Misra–Gries theorems, measured: est ∈ [true − n/(k+1), true],
  * heavy-key coverage, merge-order invariance of the guarantee, exactness
  * below capacity, bounded state, canonical serialization. The registered
  * queries (agg_mg_topk_check / agg_mg_rollup_grains) re-assert 1 and 2
  * as oracle-gated flags; this spec pins them at the unit level on
  * adversarially skewed synthetic streams where evictions and merge
  * truncations demonstrably fire.
  */
class MisraGriesSpec extends SparkSuite {

  import spark.implicits._

  /** Zipf-ish skewed stream: key j appears ~N/(j+1) times, shuffled
    * deterministically — heavy head, long tail, lots of evictions. */
  private def skewed(n: Int, keys: Int, seed: Int): Array[Long] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var j = 0
    while (out.size < n && j < keys) {
      val reps = math.max(1, n / (j + 2))
      out ++= Array.fill(math.min(reps, n - out.size))(j.toLong)
      j += 1
    }
    new scala.util.Random(seed).shuffle(out).toArray
  }

  private def exactCounts(xs: Array[Long]): Map[Long, Long] =
    xs.groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def assertGuarantee(s: MisraGries.Summary, xs: Array[Long]): Unit = {
    val ex = exactCounts(xs)
    assert(s.n === xs.length.toLong)
    val bound = s.errorBound
    // 1. every summary entry is sandwiched
    for ((k, est) <- s.entries) {
      val t = ex.getOrElse(k, 0L)
      assert(est <= t, s"overestimate: key=$k est=$est true=$t")
      assert(est >= t - bound, s"under bound: key=$k est=$est true=$t bound=$bound")
    }
    // 2. every truly-heavy key is present
    for ((k, t) <- ex if t > bound)
      assert(s.estimate(k) > 0L, s"heavy key missing: key=$k true=$t bound=$bound")
  }

  test("exact below capacity: distinct <= k keeps true counts verbatim") {
    val s = new MisraGries.Summary(16)
    val xs = skewed(2000, 10, seed = 1)
    xs.foreach(s.add)
    val ex = exactCounts(xs)
    assert(s.size === ex.size)
    for ((k, t) <- ex) assert(s.estimate(k) === t)
  }

  test("streaming guarantee holds under heavy eviction pressure") {
    val s = new MisraGries.Summary(16)
    val xs = skewed(50000, 400, seed = 2) // 400 keys through 16 slots
    xs.foreach(s.add)
    assert(s.size <= 16)
    assertGuarantee(s, xs)
  }

  test("merge keeps the SAME n/(k+1) bound across partitionings and orders") {
    val xs = skewed(60000, 300, seed = 3)
    for (parts <- Seq(2, 7, 32)) {
      val chunks = xs.grouped(math.ceil(xs.length.toDouble / parts).toInt).toSeq
      val summaries = chunks.map { c =>
        val s = new MisraGries.Summary(16); c.foreach(s.add); s
      }
      // left fold and right fold — different merge trees, same theorem
      val l = summaries.map(b => MisraGries.deserialize(b.serialize()))
        .reduceLeft(_.mergeWith(_))
      assertGuarantee(l, xs)
      val r = summaries.map(b => MisraGries.deserialize(b.serialize()))
        .reduceRight((a, b) => b.mergeWith(a))
      assertGuarantee(r, xs)
    }
  }

  test("distributed aggregator agrees with the theorem on real user_ids") {
    val ids = graft.Tables.events(spark, Sf)
      .select(org.apache.spark.sql.functions.col("user_id"))
    val xs = ids.collect().map(_.getLong(0))
    for (parts <- Seq(1, 5, 32)) {
      val bytes = ids.repartition(parts).as[Long]
        .select(new MisraGries.MgFromKeys(32).toColumn).head()
      assertGuarantee(MisraGries.deserialize(bytes), xs)
    }
  }

  test("state stays bounded by k, independent of input size") {
    val s = new MisraGries.Summary(8)
    skewed(200000, 5000, seed = 4).foreach(s.add)
    assert(s.size <= 8)
    assert(s.serialize().length <= 4 + 8 + 4 + 8 * 16 * 2) // header + 8 pairs
  }

  test("serialization is canonical and round-trips") {
    val s = new MisraGries.Summary(16)
    skewed(10000, 100, seed = 5).foreach(s.add)
    val b1 = s.serialize()
    val back = MisraGries.deserialize(b1)
    assert(back.n === s.n)
    assert(back.entries === s.entries)
    assert(java.util.Arrays.equals(back.serialize(), b1))
  }

  test("token guard: zipfian corpus makes coverage non-vacuous; flags hold") {
    import org.apache.spark.sql.functions.{col, count, explode, lit, split}
    val rows = graft.operators.HeavyHitters.mgTokensCheck(spark, Sf).collect()
    assert(rows.length == 10)
    for (r <- rows) {
      assert(r.getAs[Int]("bound_ok") == 1, r.toString)
      assert(r.getAs[Int]("coverage_ok") == 1, r.toString)
    }
    // non-vacuousness: the corpus must actually have tokens above the
    // n/(k+1) threshold (else coverage_ok proves nothing) — recompute the
    // threshold from the raw token stream
    val toks = graft.Tables.documents(spark, Sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val n = toks.count()
    val bound = n / 65
    val heavy = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > bound).count()
    assert(heavy >= 1, s"corpus has no token above n/(k+1)=$bound — guard vacuous")
  }

  test("registered guards: flags are 1 on every row, top-10 counts exact") {
    for (q <- Seq(graft.operators.HeavyHitters.mgTopkCheck _,
                  graft.operators.HeavyHitters.mgRollupGrains _)) {
      val rows = q(spark, Sf).collect()
      assert(rows.length == 10)
      for (r <- rows) {
        assert(r.getAs[Int]("bound_ok") == 1, r.toString)
        assert(r.getAs[Int]("coverage_ok") == 1, r.toString)
      }
      // counts descend with the full tiebreak
      val pairs = rows.map(r => (r.getAs[Long]("cnt"), r.getAs[Long]("user_id")))
      assert(pairs.sortBy { case (c, u) => (-c, u) }.toSeq === pairs.toSeq)
    }
  }
}
