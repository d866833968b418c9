package graft

/** Isolated dedup_event_window probe — the A/B tool behind the round-14
  * verdict's "Next round" #4: the leg's committed quiet sweep time moved
  * 0.184 s (r13) → 0.557 s (r14 driver) while the builder's own gating
  * sweep sat at 0.162 s, the one >2× detail-file flag of the round.
  *
  * Replicates the bench's per-query protocol (one untimed warmup, then
  * clearQueryState + timed run, 5 reps) in a fresh JVM under THREE
  * conditions, to split the hypotheses:
  *
  *   A. isolation — nothing ran before it: the query's own class;
  *   B. after its sweep predecessor dedup_cluster_docs (which builds the
  *      shared near-dup cluster artifact family): if the predecessor's
  *      artifact-dir cleanup / page-cache footprint taxes the follower,
  *      B should run above A;
  *   C. B with a `sync` between predecessor and probe: if B − A is
  *      flushable dirty-page backlog, C should return to A's class.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.DedupWindowProbe"
  */
object DedupWindowProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def loadavg(): Double = scala.util.Try(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    ).getOrElse(-1.0)
    val fn = SparkEntry.queries("dedup_event_window")
    val pred = SparkEntry.queries("dedup_cluster_docs")

    def protocolReps(label: String): Unit = {
      val pre = graft.operators.SessionCaches.modelKeys(spark)
      fn(spark, sfDir).count() // warmup, exactly like the sweep
      val reps = (1 to 5).map { _ =>
        graft.operators.SessionCaches.clearQueryState(spark, pre)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $label median=${reps(2)}%.3f min=${reps.head}%.3f " +
        f"max=${reps.last}%.3f load=${loadavg()}%.2f")
    }

    println(s"[probe] sf=$sfDir load_start=${loadavg()}")
    protocolReps("A_isolated")
    pred(spark, sfDir).count() // build the predecessor's artifacts
    protocolReps("B_after_cluster_docs")
    pred(spark, sfDir).count()
    scala.util.Try(new ProcessBuilder("sync").start().waitFor())
    protocolReps("C_after_cluster_docs_synced")
    spark.stop()
  }
}
