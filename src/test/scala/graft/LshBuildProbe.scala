package graft.operators

/** Minimal repro: time the LSH/IVF index builds alone. */
object LshBuildProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    graft.Tables.embeddings(spark, d).count() // warm scan path
    // warm the partitioned write path once with a trivial write
    graft.Tables.embeddings(spark, d).limit(32)
      .withColumn("sig", Similarity.sigCol(org.apache.spark.sql.functions.col("embedding")))
      .write.mode("overwrite").partitionBy("sig")
      .parquet(java.nio.file.Files.createTempDirectory("warm-").toString)
    for (i <- 1 to 3) {
      SessionCaches.clear(spark)
      timed(s"lsh index build $i")(Similarity.lshIndexDir(spark, d))
      timed(s"ivf index build $i")(Similarity.ivfIndexDir(spark, d))
    }
    spark.stop()
  }
}
