package graft.operators

import org.apache.spark.sql.SparkSession

/** Round-13 attribution probe (round-12 verdict "Next round" #4): the
  * driver's r12 bench_detail carried `dedup_keep_best` at 25.0 s and
  * `dedup_minhash_incremental` at 22.3 s cold — above r11's entire top
  * tier (14.8 s) — in a run whose own sweep total (297.8 s vs 192 s
  * committed) marked a degraded host window, but with no committed
  * per-query detail to separate contention from regression.
  *
  * This probe measures, on a quiet host at sf0.1, for each cold-tier
  * query: 3 cold reps (SessionCaches cleared before each — the bench's
  * exact per-query protocol, so every rep pays the FULL artifact
  * rebuild), one warm serve, and the shared `verifiedPairs` artifact
  * build alone. The split attributes the cold time: cold ≈ shared
  * LSH→Jaccard pair build + (CC / refresh / election) + serve, and the
  * quiet-class number either confirms the driver's 25 s as contention or
  * exposes a structural regression.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.operators.ColdTierProbe"
  */
object ColdTierProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = graft.GraftSession.local(cpus)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def load1m(): Double = scala.util.Try(java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble)
      .getOrElse(-1.0)
    println(f"[coldtier] sf=$sf cpus=$cpus load_start=${load1m()}%.2f")

    val queries: Seq[(String, () => Long)] = Seq(
      "dedup_cluster_docs" -> (() =>
        graft.SparkEntry.queries("dedup_cluster_docs")(spark, sf).count()),
      "dedup_keep_best" -> (() =>
        graft.SparkEntry.queries("dedup_keep_best")(spark, sf).count()),
      "dedup_minhash_incremental" -> (() =>
        graft.SparkEntry.queries("dedup_minhash_incremental")(spark, sf).count()))

    // the shared prerequisite, alone: every cold rep of all three queries
    // pays this build first
    SessionCaches.clear(spark)
    val tPairs = timed(Dedup.ngramJaccardPairs(spark, sf).count())
    println(f"[coldtier] verifiedPairs build+top20 alone: $tPairs%.2f s")

    queries.foreach { case (name, run) =>
      run() // untimed warm-up: codegen/JIT, same as the bench protocol
      val colds = (1 to 3).map { _ =>
        SessionCaches.clear(spark)
        val l = load1m()
        val t = timed(run())
        (t, l)
      }
      val warm = timed(run())
      val cs = colds.map(_._1).sorted
      println(f"[coldtier] $name%-26s cold med=${cs(1)}%.2f s " +
        f"[${cs.head}%.2f, ${cs.last}%.2f] warm=$warm%.2f s " +
        f"rep_loads=${colds.map(c => f"${c._2}%.1f").mkString(",")}")
    }
    println(f"[coldtier] load_end=${load1m()}%.2f")
    spark.stop()
  }
}
