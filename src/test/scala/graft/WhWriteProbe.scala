package graft

import org.apache.spark.sql.functions._

/** A/B the 10M-event warehouse write (Bench's `wh_write_10m` leg, same
  * generator, same volume): the round-15 explicit-count repartition vs
  * the round-14 bare `repartition(col(event_minute))`. The driver's r15
  * gating run saw the cold leg at 36 s (floor 6.87 s) right after the
  * explicit count landed, while the warm leg IMPROVED its floor on the
  * same code — this measures both shapes back-to-back on a quiet host,
  * alternating order so page-cache state favors neither arm.
  *
  *   Test/runMain graft.WhWriteProbe [-reps=N]
  */
object WhWriteProbe {
  def main(args: Array[String]): Unit = {
    var reps = 3
    args.foreach {
      case a if a.startsWith("-reps=") => reps = a.drop(6).toInt
      case _                           => ()
    }
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def tmp() = java.nio.file.Files.createTempDirectory("whp-").toString
    def rm(p: String): Unit = {
      def go(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(go)
        f.delete(); ()
      }
      go(new java.io.File(p))
    }
    val events = graft.reference.Events.generate(
      spark, 10_000_000L, 1704067200000L, intervalMs = 10)
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def explicitArm(): Double = timed {
      val out = tmp()
      graft.sources.Warehouse.writeEvents(events, out); rm(out)
    }
    def bareArm(): Double = timed {
      val out = tmp()
      graft.reference.Events.withEventMinute(events)
        .repartition(col("event_minute"))
        .sortWithinPartitions(col("event_minute"), col("event_type"),
          col("event_timestamp"))
        .write.mode("overwrite").partitionBy("event_minute").parquet(out)
      rm(out)
    }
    // warm both arms once (codegen, generator JIT)
    val w1 = explicitArm(); val w2 = bareArm()
    println(f"PROBE warmup explicit=$w1%.2f bare=$w2%.2f")
    (1 to reps).foreach { r =>
      val (a, b) =
        if (r % 2 == 1) (explicitArm(), bareArm())
        else { val bb = bareArm(); (explicitArm(), bb) }
      println(f"PROBE rep=$r explicit=$a%7.3f bare=$b%7.3f")
    }
    spark.stop()
  }
}
