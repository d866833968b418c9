package graft.operators

import org.apache.spark.sql.functions._

/** Isolate the 256-bucket partitioned-write cost. */
object WriteProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val stageMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, System.nanoTime())
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        Option(starts.remove(j.jobId)).foreach(t0 =>
          jobMs.addAndGet((System.nanoTime() - t0) / 1000000))
    })
    def timed(label: String)(f: => Unit): Unit = {
      jobMs.set(0)
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-46s ${(System.nanoTime() - t0) / 1e9}%7.3f s  (jobs ${jobMs.get / 1000.0}%6.3f s)")
    }
    def tmp() = java.nio.file.Files.createTempDirectory("wp-").toString
    val emb = graft.Tables.embeddings(spark, d)
      .withColumn("sig", Similarity.sigCol($"embedding"))
      .localCheckpoint()
    emb.count()
    // warm the write path once
    emb.limit(10).write.mode("overwrite").parquet(tmp())

    timed("sig compute only (noop)")(
      emb.write.format("noop").mode("overwrite").save())
    timed("flat write, no partitionBy")(
      emb.write.mode("overwrite").parquet(tmp()))
    timed("partitionBy(sig), repartition(256, sig)")(
      emb.repartition(256, $"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    timed("partitionBy(sig), bare repartition(sig)")(
      emb.repartition($"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    timed("partitionBy(sig), no repartition")(
      emb.write.mode("overwrite").partitionBy("sig").parquet(tmp()))
    spark.sparkContext.hadoopConfiguration
      .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
    timed("partitionBy(sig), repartition(256, sig), committer v2")(
      emb.repartition(256, $"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    timed("again (second run, v2)")(
      emb.repartition(256, $"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    timed("v2, repartition(32, sig)")(
      emb.repartition(32, $"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "300")
    timed("v2, repartition(32, sig), 300 conc writers")(
      emb.repartition(32, $"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    timed("v2, no repartition, 300 conc writers")(
      emb.write.mode("overwrite").partitionBy("sig").parquet(tmp()))
    spark.conf.set("spark.sql.maxConcurrentOutputFileWriters", "0")
    spark.conf.set("spark.sql.parquet.compression.codec", "uncompressed")
    timed("v2, repartition(256, sig), uncompressed")(
      emb.repartition(256, $"sig").write.mode("overwrite")
        .partitionBy("sig").parquet(tmp()))
    spark.stop()
  }
}
