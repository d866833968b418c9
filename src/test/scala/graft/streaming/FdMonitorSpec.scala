package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The integrity-bearing maintained view (Ingest.upsertFdMonitor): the
  * hash-bucketed pair-count state, built incrementally over batches, must
  * equal a from-scratch census of everything ingested; each batch's report
  * must cover exactly the batch's touched LHS groups with before/after
  * counts that reconcile against cumulative recomputes; and the
  * newly_violating alert must fire exactly once per group, at the batch
  * where its distinct-RHS count first crosses 1.
  */
class FdMonitorSpec extends SparkSuite {
  import spark.implicits._

  private val Buckets = 8 // small: forces touched + untouched x to share buckets

  private def li: DataFrame =
    graft.Tables.lineitem(spark, Sf)
      .select($"l_orderkey".as("id"), $"l_partkey", $"l_suppkey")

  test("incremental state census is exact; reports reconcile; alerts fire exactly once") {
    val dir = tmpDir("fd-monitor") + "/state"
    val slices = (0 to 2).map(r => li.filter($"id" % 3 === r).localCheckpoint())
    val reports = slices.map { b =>
      Ingest.upsertFdMonitor(b, dir, "l_partkey", "l_suppkey", Buckets).cache()
    }

    // 1. final state == from-scratch pair census over everything ingested
    val state = spark.read.parquet(dir)
    val exact = li.groupBy($"l_partkey".as("x"), $"l_suppkey".as("y"))
      .agg(count(lit(1)).as("cnt_exact"))
    assert(state.count() == exact.count())
    assert(state.join(exact, Seq("x", "y")).filter($"cnt" =!= $"cnt_exact").count() == 0)
    // state really is bucket-partitioned, and buckets match the hash rule
    assert(state.filter($"bucket" =!= pmod(xxhash64($"x"), lit(Buckets))).count() == 0)

    // 2. per-batch report covers exactly the touched groups; after-counts
    //    reconcile with a cumulative recompute through that batch
    for (i <- 0 to 2) {
      val r = reports(i)
      val touched = slices(i).select($"l_partkey".as("x")).distinct()
      assert(r.count() == touched.count())
      assert(r.filter($"rows_added" < 1).count() == 0)
      assert(r.filter($"dy_after" < $"dy_before").count() == 0)
      assert(r.filter(
        $"newly_violating" =!= ($"dy_before" <= 1 && $"dy_after" > 1)).count() == 0)
      val cumulative = slices.take(i + 1).reduce(_ unionByName _)
        .groupBy($"l_partkey".as("x"), $"l_suppkey").agg(count(lit(1)).as("c"))
        .groupBy($"x").agg(sum($"c").as("n_cum"), count(lit(1)).as("dy_cum"))
      val j = r.join(cumulative, "x")
      assert(j.count() == r.count())
      assert(j.filter($"n_after" =!= $"n_cum" || $"dy_after" =!= $"dy_cum").count() == 0)
    }

    // 3. a group alerts at most once across the run, and every group that
    //    ends violating alerted in exactly one batch
    val alerts = reports.reduce(_ unionByName _).filter($"newly_violating")
      .groupBy($"x").agg(count(lit(1)).as("fires"))
    assert(alerts.filter($"fires" > 1).count() == 0)
    val endViolating = exact.groupBy($"x").agg(count(lit(1)).as("dy"))
      .filter($"dy" > 1)
    assert(alerts.count() == endViolating.count())
    assert(alerts.join(endViolating, "x").count() == endViolating.count())

    reports.foreach(_.unpersist())
  }

  test("empty batch is a no-op: empty report, state untouched") {
    val dir = tmpDir("fd-monitor-empty") + "/state"
    Ingest.upsertFdMonitor(li.filter($"id" % 3 === 0), dir,
      "l_partkey", "l_suppkey", Buckets)
    val before = spark.read.parquet(dir).count()
    val r = Ingest.upsertFdMonitor(li.filter(lit(false)), dir,
      "l_partkey", "l_suppkey", Buckets)
    assert(r.isEmpty)
    assert(spark.read.parquet(dir).count() == before)
  }
}
