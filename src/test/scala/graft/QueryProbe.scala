package graft

/** Generic isolated-query probe: replicate the bench sweep's per-query
  * protocol (one untimed warmup, then clearQueryState + timed, 5 reps)
  * for any registered query in a fresh JVM — the attribution tool the
  * per-round >2× sweep flags keep needing (DedupWindowProbe was its
  * one-query ancestor).
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "Test/runMain graft.QueryProbe <query> [<query> ...]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProbe <queryName> [<queryName> ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def loadavg(): Double = scala.util.Try(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    ).getOrElse(-1.0)
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val pre = graft.operators.SessionCaches.modelKeys(spark)
      fn(spark, sfDir).count() // warmup, exactly like the sweep
      val reps = (1 to 5).map { _ =>
        graft.operators.SessionCaches.clearQueryState(spark, pre)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[probe] $name median=${reps(2)}%.3f min=${reps.head}%.3f " +
        f"max=${reps.last}%.3f load=${loadavg()}%.2f")
    }
    spark.stop()
  }
}
