package graft

/** Manual timing helper: best-of-3 warm wall-time for named registered
  * queries. `SPARK_GRAFT_SF_DIR` picks the corpus (default sf0.1),
  * mirroring Bench's session settings. Usage:
  *   sbt "Test/runMain graft.TimeQuery rag_chunk_retrieve text_bm25_topk"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      var best = Double.MaxValue
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        fn(spark, sf).collect()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[timequery] $name%-30s $best%.3f s")
    }
    spark.stop()
  }
}
