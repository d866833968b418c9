package graft.functions

import graft.SparkSuite

/** Bounds for the KLL quantile sketch: rank error vs exact quantiles,
  * mergeability across partitionings and across serialized cells, exact
  * weight preservation, bounded state, and serialization round-trip.
  * The registered queries (agg_kll_check, agg_kll_rollup_grains) carry
  * the 2% realized-rank oracle guard; this spec pins the tighter 1%
  * engineering bound the guard is derived from. */
class KllSketchSpec extends SparkSuite {

  import spark.implicits._

  private val Probes = Seq(0.5, 0.9, 0.99)

  // tie-safe rank measurement: rankIntervalDist from SparkSuite (a
  // binarySearch point rank lands on an ARBITRARY index among tied
  // values, so it can drift by the tie multiplicity even for an exact
  // discrete quantile)

  private def values: Array[Double] =
    graft.Tables.events(spark, Sf)
      .select($"value").na.drop().as[Double].collect().sorted

  test("estimates land within 1% rank error of exact quantiles") {
    val sorted = values
    val sk = new KllSketch.Sketch(KllSketch.DefaultK)
    sorted.foreach(sk.add)
    for (q <- Probes) {
      val e = rankIntervalDist(sorted, sk.quantile(q), q)
      assert(e <= 0.01, s"q=$q rank-dist=$e")
    }
  }

  test("estimates are real stored input values (discrete, never interpolated)") {
    val sorted = values
    val set = sorted.toSet
    val sk = new KllSketch.Sketch(KllSketch.DefaultK)
    sorted.foreach(sk.add)
    for (q <- Probes) assert(set.contains(sk.quantile(q)))
  }

  test("distributed sketches agree across partitionings within the bound") {
    val ds = graft.Tables.events(spark, Sf).select($"value").na.drop().as[Double]
    val sorted = values
    val qsByPartitioning = Seq(1, 13).map { p =>
      ds.repartition(p)
        .select(new KllSketch.KllQuantiles().toColumn).head()
    }
    for (qs <- qsByPartitioning; (q, est) <- Probes.zip(qs))
      assert(rankIntervalDist(sorted, est, q) <= 0.01,
        s"q=$q est=$est rank-dist=${rankIntervalDist(sorted, est, q)}")
  }

  test("merge preserves total weight exactly and keeps the rank bound") {
    val sorted = values
    val (lo, hi) = sorted.splitAt(sorted.length / 3) // uneven, sorted halves:
    // a worst-ish case for merge (disjoint value ranges, unequal sizes)
    val a = new KllSketch.Sketch(KllSketch.DefaultK)
    val b = new KllSketch.Sketch(KllSketch.DefaultK)
    lo.foreach(a.add)
    hi.reverse.foreach(b.add)
    val m = a.mergeWith(b)
    assert(m.n === sorted.length.toLong)
    assert(m.totalWeight === sorted.length.toLong,
      "compaction/merge must preserve total weight exactly")
    for (q <- Probes)
      assert(rankIntervalDist(sorted, m.quantile(q), q) <= 0.01, s"q=$q")
  }

  test("serialized cells merge to the same answers as live sketches") {
    val sorted = values
    // 7 cells, round-robin — the maintained-view shape
    val cells = Array.fill(7)(new KllSketch.Sketch(KllSketch.DefaultK))
    sorted.zipWithIndex.foreach { case (v, i) => cells(i % 7).add(v) }
    val merged = cells
      .map(c => KllSketch.deserialize(c.serialize()))
      .reduce(_.mergeWith(_))
    assert(merged.n === sorted.length.toLong)
    for (q <- Probes)
      assert(rankIntervalDist(sorted, merged.quantile(q), q) <= 0.01, s"q=$q")
  }

  test("state stays bounded by k, independent of input size") {
    def retainedAt(n: Int): Int = {
      val sk = new KllSketch.Sketch(KllSketch.DefaultK)
      val rnd = new scala.util.Random(7)
      (1 to n).foreach(_ => sk.add(rnd.nextGaussian()))
      assert(sk.totalWeight === n.toLong)
      sk.retainedItems
    }
    val bound = 3 * KllSketch.DefaultK // Σ k·(2/3)^d ≤ 3k
    val at100k = retainedAt(100000)
    assert(at100k <= bound, s"$at100k items retained")
    assert(retainedAt(1000000) <= bound) // 10x the data, same bound
  }

  test("report-grain guard holds at every day×type cell") {
    val rows = graft.operators.Kll.kllReportGrain(spark, Sf).collect()
    assert(rows.nonEmpty)
    // tie-safe rank-interval flag true in every cell, exact quantiles
    // present and ordered (cells are small -> sketch serves the exact
    // discrete quantile, so the guard must hold with zero slack used)
    for (r <- rows) {
      assert(r.getAs[Int]("within_rank_bound") == 1, r.toString)
      val (p50, p90, p99) = (r.getAs[Double]("p50_exact"),
        r.getAs[Double]("p90_exact"), r.getAs[Double]("p99_exact"))
      assert(p50 <= p90 && p90 <= p99, r.toString)
    }
  }

  test("deterministic for a fixed input order; round-trips serialization") {
    val rnd = new scala.util.Random(11)
    val xs = Array.fill(50000)(rnd.nextDouble())
    def build(): KllSketch.Sketch = {
      val sk = new KllSketch.Sketch(KllSketch.DefaultK)
      xs.foreach(sk.add)
      sk
    }
    val a = build().serialize()
    val b = build().serialize()
    assert(java.util.Arrays.equals(a, b), "same input order must give identical state")
    val rt = KllSketch.deserialize(a)
    assert(java.util.Arrays.equals(rt.serialize(), a))
  }
}
