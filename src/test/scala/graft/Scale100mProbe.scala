package graft

/** Isolated 100M-join probe — the A/B tool behind SCALE_NOTES Leg 31
  * (round-13 verdict "Next round" #3: attribute the quiet-run scale_100m
  * drift 14.0 → 15.4/19.3 s across r12→r13 sweeps). Runs EXACTLY the
  * bench leg's protocol (one untimed discard, then median of 3 with
  * spread and per-rep host load) in a fresh JVM with NO sweep before or
  * after it, so the number isolates the leg's code + data generation
  * from the bench session's accumulated footprint. Run on the r12 tree
  * vs HEAD to split code drift from environment drift:
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.Scale100mProbe"
  */
object Scale100mProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def loadavg(): Double = scala.util.Try(
      java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    ).getOrElse(-1.0)
    println(s"[probe] load_start=${loadavg()}")
    scala.util.Try(Bench.scale100mLeg(spark)) // untimed discard: JIT
    val reps = (1 to 3).map { i =>
      val l = loadavg()
      val (metrics, _) = Bench.scale100mLeg(spark)
      val m = metrics.toMap
      println(f"[probe] rep$i load=$l%.2f join_sec=${m("scale_100m_join_sec")}%.3f " +
        f"skew=${m("scale_100m_task_skew_max")}%.2f")
      m("scale_100m_join_sec")
    }.sorted
    println(f"[probe] scale_100m_join_sec median=${reps(1)}%.3f " +
      f"min=${reps.head}%.3f max=${reps.last}%.3f load_end=${loadavg()}")
    spark.stop()
  }
}
