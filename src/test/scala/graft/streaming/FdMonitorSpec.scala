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

  test("rangeBucketOf: aligned range buckets keep localized batches narrow") {
    // the Leg-22 physics (FdMonitorProbe): hash bucketing scatters a
    // contiguous key range over every bucket; the ready-made
    // rangeBucketOf helper must (1) keep the state census exact, (2) lay
    // keys out by the declared range rule, (3) collapse a key-localized
    // batch's touched slice to ~|batch range|/|domain| of the buckets
    val dir = tmpDir("fd-monitor-range") + "/state"
    val maxPart = li.agg(max($"l_partkey")).head().getLong(0)
    val byRange = Ingest.rangeBucketOf(0L, maxPart)
    // three contiguous l_partkey thirds — a tenant/time-partitioned
    // upstream's shape
    val cut1 = maxPart / 3
    val cut2 = 2 * maxPart / 3
    val slices = Seq(
      li.filter($"l_partkey" <= cut1),
      li.filter($"l_partkey" > cut1 && $"l_partkey" <= cut2),
      li.filter($"l_partkey" > cut2)).map(_.localCheckpoint())
    slices.foreach { b =>
      Ingest.upsertFdMonitor(b, dir, "l_partkey", "l_suppkey", Buckets, byRange)
    }
    val state = spark.read.parquet(dir)
    // census exact under the non-default bucketing too
    val exact = li.groupBy($"l_partkey".as("x"), $"l_suppkey".as("y"))
      .agg(count(lit(1)).as("cnt_exact"))
    assert(state.count() == exact.count())
    assert(state.join(exact, Seq("x", "y"))
      .filter($"cnt" =!= $"cnt_exact").count() == 0)
    // layout follows the declared range rule
    val width = math.max(maxPart / Buckets + 1, 1L)
    assert(state.filter($"bucket" =!=
      least(greatest(floor($"x" / width), lit(0L)), lit((Buckets - 1).toLong))
        .cast("int")).count() == 0)
    // a one-third-of-the-domain batch touches about a third of the
    // buckets (a contiguous third spans ceil(8/3)=3 widths and can
    // straddle one seam on each end ⇒ ≤4), never all of them — the
    // 4.5× lever
    slices.foreach { b =>
      val touched = b.select(least(greatest(
        floor($"l_partkey" / width), lit(0L)), lit((Buckets - 1).toLong)))
        .distinct().count()
      assert(touched <= Buckets / 3 + 2,
        s"localized batch scattered to $touched/$Buckets buckets")
    }
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
