package graft

import java.nio.file.{Files, Paths}

/** Optimization-iteration helper (test scope, never shipped to the driver):
  * time individual registered queries with EXACTLY Bench's cold-run
  * methodology (one warmup, then clearQueryState-then-count per rep, model
  * registry semantics identical), and optionally dump the formatted plan.
  *
  * Usage (from sbt):
  *   Test/runMain graft.QTime [-sf=<dir>] [-reps=N] [-plans=<dir>] q1 q2 …
  *
  * Env: SPARK_GRAFT_CPUS (default 32 here — the gating bench shape).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    var sfDir = "/root/testdata/sf0.1"
    var reps = 3
    var plansDir: Option[String] = None
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    args.foreach {
      case a if a.startsWith("-sf=")    => sfDir = a.drop(4)
      case a if a.startsWith("-reps=")  => reps = a.drop(6).toInt
      case a if a.startsWith("-plans=") => plansDir = Some(a.drop(7))
      case a                            => names += a
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus)
    val out = new StringBuilder
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val preModels = graft.operators.SessionCaches.modelKeys(spark)
      fn(spark, sfDir).count() // warmup (codegen/JIT/listing)
      val samples = (1 to reps).map { _ =>
        graft.operators.SessionCaches.clearQueryState(spark, preModels)
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // warm serve (artifacts now in place)
      val t1 = System.nanoTime()
      fn(spark, sfDir).count()
      val warm = (System.nanoTime() - t1) / 1e9
      val line = f"$name%-28s cold=${samples.sorted.apply(samples.size / 2)}%7.3f  min=${samples.min}%7.3f  max=${samples.max}%7.3f  warm=$warm%7.3f"
      println("QTIME " + line)
      out.append(line).append('\n')
      plansDir.foreach { pd =>
        Files.createDirectories(Paths.get(pd))
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(pd, s"$name.txt"), plan)
      }
    }
    println("QTIME ==== summary ====")
    print(out.toString.linesIterator.map("QTIME " + _ + "\n").mkString)
    spark.stop()
  }
}
