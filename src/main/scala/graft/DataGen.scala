package graft

import graft.reference.Events
import graft.sources.Warehouse

/** Producer-leg CLI (the reference runs a standalone Kafka producer,
  * producer/producer.py; here the generator writes straight into the
  * minute-partitioned warehouse — or stage the events as plain parquet and
  * run `Pipeline.ingest` for the checkpointed streaming path).
  *
  * Usage: runMain graft.DataGen <nEvents> <outDir> [startEpochMillis]
  */
object DataGen {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DataGen <nEvents> <outDir> [startEpochMillis]")
    val n = args(0).toLong
    val out = args(1)
    val start = if (args.length > 2) args(2).toLong else 1704067200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus)
    val t0 = System.nanoTime()
    Warehouse.writeEvents(Events.generate(spark, n, start), out)
    val secs = (System.nanoTime() - t0) / 1e9
    val parts = new java.io.File(out).listFiles()
      .count(_.getName.startsWith("event_minute="))
    println(f"[datagen] wrote $n%d events into $parts%d minute partitions at $out in $secs%.1f s")
    spark.stop()
  }
}
