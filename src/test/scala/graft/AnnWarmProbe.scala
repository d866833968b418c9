package graft

import org.apache.spark.sql.SparkSession

/** A/B probe: the ANN panel's 6 prerequisite build chains run
  * sequentially vs from a 4-thread pool (guide §2.6). Times each phase
  * per rep with per-rep cold resets, alternating orders so JIT favors
  * neither arm.
  *
  *   Test/runMain graft.AnnWarmProbe [-sf=<dir>] [-reps=N]
  */
object AnnWarmProbe {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var reps = 3
    args.foreach {
      case a if a.startsWith("-sf=")   => sfDir = a.drop(4)
      case a if a.startsWith("-reps=") => reps = a.drop(6).toInt
      case _                           => ()
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark: SparkSession = GraftSession.local(cpus)

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def seqBuild(): Seq[(String, Double)] =
      graft.operators.AnnPanel.probeWarmPhases(spark, sfDir)
    def parBuild(): Double = t(graft.operators.AnnPanel.probeWarm(spark, sfDir))

    // warmup both arms once (codegen/JIT)
    seqBuild(); graft.operators.SessionCaches.clear(spark)
    parBuild(); graft.operators.SessionCaches.clear(spark)
    (1 to reps).foreach { r =>
      val s = seqBuild()
      graft.operators.SessionCaches.clear(spark)
      val p = parBuild()
      graft.operators.SessionCaches.clear(spark)
      val seqTotal = s.map(_._2).sum
      println(f"PROBE rep=$r seq_total=$seqTotal%.3f par_total=$p%.3f " +
        s.map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    }
    // panel-build phase split (noop sink): warm / ranked union / decorate
    (1 to reps).foreach { r =>
      val ph = graft.operators.AnnPanel.probePanelPhases(spark, sfDir)
      graft.operators.SessionCaches.clear(spark)
      println(f"PROBE phases rep=$r " +
        ph.map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    }
    spark.stop()
  }
}
