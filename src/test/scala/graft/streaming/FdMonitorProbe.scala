package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCALE_NOTES Leg 22 measurement (run manually, results recorded there):
  * the FD-monitor maintained view under the two batch regimes that decide
  * whether bucketed dynamic-partition-overwrite maintenance survives at
  * scale.
  *
  * Regime A (adversarial): uniform batches — every batch's LHS keys are
  * spread over the whole key space, so every batch touches (nearly) every
  * bucket and the rewrite slice IS the full state. Per-batch cost must
  * grow with accumulated state: the honest worst case the scaladoc on
  * [[Ingest.upsertFdMonitor]] warns about.
  *
  * Regime B (localized): each batch's LHS keys live in a narrow key
  * range — the shape a time- or tenant-partitioned upstream actually
  * produces — so touched buckets ∝ batch, not state. Per-batch cost must
  * stay flat as the state grows around it.
  *
  * Correctness is asserted in both regimes: the final state census must
  * equal the from-scratch pair-count census of everything ingested.
  */
object FdMonitorProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.1")
      .select($"l_orderkey".as("id"), $"l_partkey", $"l_suppkey")
      .localCheckpoint()
    val nBatches = 8

    def timed[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    type BucketFn = (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column
    val hashBuckets: BucketFn = (x, b) => pmod(xxhash64(x), lit(b))

    def run(tag: String, mkBatch: Int => DataFrame,
        bucketOf: BucketFn = hashBuckets, buckets: Int = 256): Unit = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"fdprobe-$tag").toString + "/state"
      // untimed discard rep on a scratch dir: JIT + codegen caches
      Ingest.upsertFdMonitor(mkBatch(0), dir + "-warmup",
        "l_partkey", "l_suppkey", buckets, bucketOf)
      val times = (0 until nBatches).map { i =>
        val b = mkBatch(i).localCheckpoint()
        val touched = b.select(bucketOf($"l_partkey", buckets)).distinct().count()
        val t = timed {
          Ingest.upsertFdMonitor(b, dir, "l_partkey", "l_suppkey", buckets, bucketOf)
        }
        val stateRows = spark.read.parquet(dir).count()
        println(f"[fdprobe] $tag batch=$i upsert=$t%.2f s " +
          f"touched_buckets=$touched/$buckets state_rows=$stateRows")
        t
      }
      println(f"[fdprobe] $tag first=${times.head}%.2f s last=${times.last}%.2f s " +
        f"ratio=${times.last / times.head}%.2f")
      val state = spark.read.parquet(dir)
      val exact = (0 until nBatches).map(mkBatch).reduce(_ unionByName _)
        .groupBy($"l_partkey".as("x"), $"l_suppkey".as("y"))
        .agg(count(lit(1)).as("cnt_exact"))
      assert(state.count() == exact.count(), s"$tag: state row count drifted")
      assert(state.join(exact, Seq("x", "y"))
        .filter($"cnt" =!= $"cnt_exact").count() == 0,
        s"$tag: state counts drifted from from-scratch census")
      println(s"[fdprobe] $tag state census exact: OK")
    }

    // Regime A: id % nBatches — part keys uniform across the whole space
    run("uniform", i => li.filter($"id" % nBatches === i))
    // Regime B: contiguous l_partkey ranges (localized LHS) but the
    // DEFAULT hash bucketing — locality scattered, expect no win
    val maxPart = li.agg(max($"l_partkey")).head().getLong(0)
    val span = maxPart / nBatches + 1
    def localized(i: Int): DataFrame =
      li.filter($"l_partkey" >= i * span && $"l_partkey" < (i + 1) * span)
    run("localized-hash", localized)
    // Regime C: the same localized batches with RANGE bucketing aligned
    // to the key space — touched buckets ∝ batch span, flat per-batch
    // cost. Uses the shipped helper this probe's Leg-22 numbers justify
    // (round 12 packaged the hand-rolled expression as
    // Ingest.rangeBucketOf; the probe now exercises the production path)
    run("localized-range", localized, Ingest.rangeBucketOf(0L, maxPart))
    spark.stop()
  }
}
