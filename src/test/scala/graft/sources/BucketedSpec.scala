package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bucketed co-located join: values match the plain join, and the plan has
  * no exchange (the whole point of paying the bucketing at write time). */
class BucketedSpec extends SparkSuite {

  test("bucket-aware SMJ joins with no Exchange and no extra Sort") {
    Bucketed.writeBucketed(spark, Sf, tmpDir("bucketed-plan"))
    // force the SMJ path: broadcast would hide the exchange question
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = Bucketed.coLocatedJoin(spark, Sf).queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // NOTE: a narrow per-bucket Sort remains above each scan — Spark 4
      // removed the v1 sorted-bucket-scan ordering propagation (the legacy
      // outputOrdering flag is gone), so the write-time sortBy can't elide
      // it. That sort is per-task and shuffle-free; the Exchange
      // elimination above is the scale win being asserted.
      assert(plan.contains("Bucketed: true"), s"scan not bucket-aware:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucket pruning metadata missing:\n$plan")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("two source dirs in one session get DISTINCT bucketed tables") {
    // regression: a name-only cache served sf0.001 data for a later sfDir
    val d2 = "/root/testdata/sf0.01"
    Bucketed.writeBucketed(spark, Sf, tmpDir("bucketed-a"))
    Bucketed.writeBucketed(spark, d2, tmpDir("bucketed-b"))
    val n1 = Bucketed.coLocatedJoin(spark, Sf).count()
    val n2 = Bucketed.coLocatedJoin(spark, d2).count()
    assert(n1 != n2, s"sf0.001 and sf0.01 joins must differ in size ($n1 vs $n2)")
    val plain = {
      import spark.implicits._
      graft.Tables.orders(spark, d2)
        .join(graft.Tables.lineitem(spark, d2), $"o_orderkey" === $"l_orderkey").count()
    }
    assert(n2 == plain, "bucketed join must match the plain join row count")
  }

  test("bucketed join values match the plain parquet join exactly") {
    val bucketed = Bucketed.priorityRevenue(spark, Sf)
    val plain = {
      import spark.implicits._
      graft.Tables.orders(spark, Sf)
        .join(graft.Tables.lineitem(spark, Sf), $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          (sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100) - round($"l_discount" * 100).cast("long"))) / 10000.0)
            .cast("double").as("revenue"))
        .select($"o_orderpriority", $"n_items", round($"revenue", 2).as("revenue"))
        .orderBy($"o_orderpriority")
    }
    assert(bucketed.collect().toSeq == plain.collect().toSeq)
  }
}
