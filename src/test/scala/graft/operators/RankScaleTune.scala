package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Manual scale probe for the RankStats global-order machinery (run:
  * sbt "Test/runMain graft.operators.RankScaleTune"). Results in
  * SCALE_NOTES.md Leg 18.
  *
  * The question: does the range-bucket + broadcast-offset pattern
  * actually beat the naive `Window.orderBy` (Exchange SinglePartition)
  * it replaces, and does it still run where the naive plan cannot?
  * Measures both at 10M rows, then RankStats alone at 100M — with a
  * correctness cross-check (the two 10M rankings must agree exactly)
  * and a checksum at 100M.
  */
object RankScaleTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[rank-tune] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    def gen(n: Long) = spark.range(0, n).select(
      $"id", pmod(xxhash64($"id"), lit(1000000007L)).cast("double").as("v"))

    // ---- 10M: naive single-partition window vs RankStats, same result
    val d10 = gen(10_000_000L).localCheckpoint()
    val naive = time("naive Window.orderBy row_number, 10M (SinglePartition)") {
      d10.withColumn("rn", row_number().over(Window.orderBy($"v", $"id")))
        .agg(sum($"rn" * $"id" % 1000000007L)).head().getLong(0)
    }
    val ranked10 = time("RankStats.withGlobalRowNumber, 10M (32 buckets)") {
      RankStats.withGlobalRowNumber(d10, "v", asc = true, tieCols = Seq("id"))
        .agg(sum($"__rn" * $"id" % 1000000007L)).head().getLong(0)
    }
    require(naive == ranked10,
      s"10M ranking checksum mismatch: naive=$naive rankstats=$ranked10")
    println(s"[rank-tune] 10M checksums agree: $ranked10")

    // ---- 100M: only the scalable plan
    val d100 = gen(100_000_000L)
    val c100 = time("RankStats.withGlobalRowNumber, 100M") {
      RankStats.withGlobalRowNumber(d100, "v", asc = true, tieCols = Seq("id"))
        .agg(sum($"__rn" * $"id" % 1000000007L), max($"__rn")).head()
    }
    println(s"[rank-tune] 100M checksum=${c100.getLong(0)} max_rn=${c100.getLong(1)}")
    require(c100.getLong(1) == 100_000_000L, "max global row number must equal n")
    spark.stop()
  }
}
