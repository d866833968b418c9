package graft.operators

import org.apache.spark.sql.functions._

/** Phase probe for doc_dedup_pipeline's cold build (guide §1). */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // full warmup
    Dedup.dedupPipeline(spark, d).count()
    SessionCaches.clear(spark)

    timed("1 nearDupClusters artifact")(Dedup.nearDupClusters(spark, d).count())
    timed("2 kmeans centroids (model)")(Similarity.kmeansCentroids(spark, d))
    val embSet = graft.Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    timed("3 semDedupOf over embeddings")(
      Similarity.semDedupOf(spark, d, embSet).count())
    SessionCaches.clear(spark)
    timed("4 full dedupPipeline cold (incl 1-3)")(
      Dedup.dedupPipeline(spark, d).count())
    // and once with models retained (the bench sweep's real shape)
    SessionCaches.clearQueryState(spark, SessionCaches.modelKeys(spark))
    timed("5 full dedupPipeline cold (models served)")(
      Dedup.dedupPipeline(spark, d).count())
    spark.stop()
  }
}
