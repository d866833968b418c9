package graft

import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-stress experiment (round-7 verdict "Next round" #5): every join in
  * the bench sweep runs on well-distributed testdata keys, so the 100×
  * claim for the join surface rested on AQE defaults nobody had exercised.
  * This main plants a 30% hot key in a 10M-row fact table, forces the
  * shuffle (sort-merge) join path — at 100 TB the dimension may not
  * broadcast — and measures the join stage's per-task time distribution
  * with and without AQE skew splitting, via a SparkListener.
  *
  * Findings land in SCALE_NOTES.md Leg 14. The headline knob: AQE's
  * DEFAULT skew threshold (256 MB / factor 5) does NOT split this hot
  * partition — ~3M rows of a 10M-row table is tens of MB of shuffle bytes,
  * far under the byte threshold while being a 15×+ task-time straggler.
  * `skewedPartitionThresholdInBytes` (with `advisoryPartitionSizeInBytes`)
  * must be sized to the actual shuffle, and then the straggler disappears.
  *
  *   sbt "Test/runMain graft.SkewStress"          # 10M rows, 3 configs
  *   SKEW_ROWS=1000000 sbt "Test/runMain ..."     # quicker iteration
  */
object SkewStress {

  /** Per-stage (duration, shuffle-read bytes) per task, collected as
    * tasks end. The JOIN stage is identified as the one reading the most
    * shuffle bytes — picking by total duration can select the (uniform)
    * scan stage and hide the straggler. */
  private final class TaskTimes extends SparkListener {
    val byStage = TrieMap.empty[Int, ArrayBuffer[(Long, Long, Long)]]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = Option(t.taskMetrics).map(_.shuffleReadMetrics)
      val buf = byStage.getOrElseUpdate(t.stageId, ArrayBuffer.empty)
      buf.synchronized {
        buf += ((t.taskInfo.duration,
          m.map(_.totalBytesRead).getOrElse(0L),
          m.map(_.recordsRead).getOrElse(0L)))
      }
    }
  }

  private def fact(s: SparkSession, rows: Long) = {
    import s.implicits._
    // 30% of rows hash onto user 42; the rest spread over 100k users.
    // The payload is hash-derived (incompressible): a constant-key hot
    // partition of CONSTANT payloads lz4-compresses so well that
    // byte-based skew detection never sees it (first finding of this
    // experiment — see SCALE_NOTES Leg 14); real values don't do that.
    s.range(rows).select(
      when(pmod(xxhash64($"id"), lit(100)) < 30, lit(42L))
        .otherwise(pmod(xxhash64($"id" + 7), lit(100000L))).as("user_id"),
      (pmod(xxhash64($"id" + 13), lit(1000000L)) / lit(1000.0)).as("value"))
  }

  private def dim(s: SparkSession) = {
    import s.implicits._
    s.range(100000).select($"id".as("user_id"),
      concat(lit("seg-"), $"id" % 50).as("segment"))
  }

  def run(s: SparkSession, rows: Long, label: String): Unit = {
    val listener = new TaskTimes
    s.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    // hot-key join → per-segment rollup; autoBroadcast is disabled by the
    // caller so the join shuffles both sides on user_id
    val n = fact(s, rows).join(dim(s), "user_id")
      .groupBy(col("segment"))
      .agg(sum(col("value")).as("v"), count(lit(1)).as("n"))
      .count()
    val wall = (System.nanoTime() - t0) / 1e9
    s.sparkContext.removeSparkListener(listener)
    require(n == 50, s"unexpected result cardinality $n")
    // the join stage = the stage reading the most shuffle bytes
    val (_, tasks) = listener.byStage.toSeq
      .maxBy { case (_, ds) => ds.map(_._2).sum }
    val durs = tasks.map(_._1).toSeq.sorted
    val bytes = tasks.map(_._2).toSeq.sorted
    val recs = tasks.map(_._3).toSeq.sorted
    val (medD, maxD) = (durs(durs.size / 2), durs.last)
    val (medB, maxB) = (bytes(bytes.size / 2), bytes.last)
    val (medR, maxR) = (recs(recs.size / 2), recs.last)
    println(f"[skew] $label%-24s wall=$wall%6.2f s  join tasks=${durs.size}%4d  " +
      f"time med=${medD / 1e3}%5.2f max=${maxD / 1e3}%5.2f s (${maxD.toDouble / medD}%4.1fx)  " +
      f"rows med=${medR / 1000}%5dk max=${maxR / 1000}%6dk (${maxR.toDouble / math.max(medR, 1)}%4.1fx)  " +
      f"bytes med=${medB / 1048576.0}%5.1f max=${maxB / 1048576.0}%6.1f MB")
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SKEW_ROWS", "10000000").toLong
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // force the shuffle-join path: the 100k-row dim broadcasts at defaults,
    // which would dodge the skew instead of demonstrating it
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    // unrecorded warm-up: the first pipeline in a fresh JVM pays codegen +
    // JIT that would otherwise be misread as the no-AQE config's cost
    run(s, rows / 10, "jvm-warmup")

    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run(s, rows, "no-AQE-skew")

    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    run(s, rows, "AQE-skew-defaults")

    // the knobs that actually fire on this shape: thresholds sized to the
    // COMPRESSED shuffle bytes. The hot partition is 14.5× the median by
    // rows but only ~2.2× by bytes (constant join key + lz4), so both the
    // 256 MB default threshold AND the 5× size factor miss it — byte-based
    // skew detection under-detects compressible hot keys, and the fix is
    // sizing threshold/factor to the observed compressed partition sizes.
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2m")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
    run(s, rows, "AQE-skew-tuned")

    s.stop()
  }
}
