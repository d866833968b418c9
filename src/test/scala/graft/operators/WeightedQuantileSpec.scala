package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Exact weighted quantiles without a single-partition sort
  * (Relational.aggWeightedQuantile): hand-computed ground truth via a
  * brute-force in-memory recompute, plus the no-SinglePartition plan
  * guarantee (also enforced fleet-wide by PlanHygieneSpec). */
class WeightedQuantileSpec extends SparkSuite {

  /** Brute-force reference: smallest v with cumulative weight >= q*W,
    * ties-inclusive (all equal values carry their summed weight). */
  private def wq(rows: Seq[(Double, Double)], q: Double): Double = {
    val sorted = rows.sortBy(_._1)
    val w = rows.map(_._2).sum
    var cum = 0.0
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)._1
      // consume ALL rows tied at v before testing the threshold
      while (i < sorted.length && sorted(i)._1 == v) { cum += sorted(i)._2; i += 1 }
      if (cum >= q * w) return v
    }
    sorted.last._1
  }

  test("per-flag weighted p25/p50/p75 match the brute-force recompute") {
    val data = Tables.lineitem(spark, Sf)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val got = Relational.aggWeightedQuantile(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val flag = r.getString(0)
      val rows = data.filter(_._1 == flag).map(t => (t._2, t._3)).toSeq
      assert(r.getDouble(1) == rows.map(_._2).sum, s"$flag w_total")
      assert(r.getDouble(2) == wq(rows, 0.25), s"$flag p25")
      assert(r.getDouble(3) == wq(rows, 0.50), s"$flag p50")
      assert(r.getDouble(4) == wq(rows, 0.75), s"$flag p75")
    }
  }

  test("the plan has no single-partition exchange") {
    val plan = Relational.aggWeightedQuantile(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), plan)
  }
}
