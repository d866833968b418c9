package graft.operators

import org.apache.spark.sql.functions._

/** Phase probe for the near-dup cluster family (guide §1): where do
  * dedup_cluster_docs / dedup_cluster_incremental / dedup_keep_best
  * spend their cold seconds — the verified-pairs artifact build, the
  * connected components, the mapping write, or the serve itself?
  *
  *   Test/runMain graft.operators.ClusterProbe [-reps=N]
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    var reps = 2
    args.foreach {
      case a if a.startsWith("-reps=") => reps = a.drop(6).toInt
      case _                           => ()
    }
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    import spark.implicits._

    def t(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup the whole family once (JIT/codegen)
    Dedup.nearDupClusters(spark, d).count()
    Dedup.incrementalClusterRefresh(spark, d).count()
    Dedup.keepBestClusters(spark, d).count()
    SessionCaches.clear(spark)

    (1 to reps).foreach { r =>
      val tvp = t(Dedup.verifiedPairs(spark, d).count()) // artifact build
      val edges = Dedup.verifiedPairs(spark, d)
        .filter($"jaccard" >= 0.5).select($"doc_a", $"doc_b")
      val tcc = t(Dedup.connectedComponents(edges).count())
      val tdocs = t(Dedup.nearDupClusters(spark, d).count()) // mapping+write+serve
      val tincr = t(Dedup.incrementalClusterRefresh(spark, d).count())
      val tbest = t(Dedup.keepBestClusters(spark, d).count())
      println(f"PROBE rep=$r verified_pairs=$tvp%7.3f cc=$tcc%7.3f " +
        f"cluster_docs=$tdocs%7.3f incr=$tincr%7.3f keep_best=$tbest%7.3f")
      SessionCaches.clear(spark)
    }
    spark.stop()
  }
}
