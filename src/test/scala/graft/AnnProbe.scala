package graft.operators

/** Phase probe for the ANN panel family (guide §1). */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    AnnPanel.annPanel(spark, d).count() // full warmup
    SessionCaches.clear(spark)

    timed("panelQueries")(AnnPanel.panelQueries(spark, d))
    val qs = AnnPanel.panelQueries(spark, d)
    timed("kmeans centroids")(Similarity.kmeansCentroids(spark, d))
    timed("ivf index build")(Similarity.ivfIndexDir(spark, d))
    timed("lsh index build")(Similarity.lshIndexDir(spark, d))
    timed("pq codebooks")(Pq.codebooksOf(graft.Tables.embeddings(spark, d), d))
    timed("sq8 params")(Sq8.paramsOf(graft.Tables.embeddings(spark, d), d))
    timed("pca eig")(Pca.eig(spark, d))
    for ((name, df) <- AnnPanel.panelMethods(spark, d, qs))
      timed(s"method $name")(noop(df))
    timed("full annPanel build (warm models/idx)")(AnnPanel.annPanel(spark, d).count())
    SessionCaches.clearQueryState(spark, SessionCaches.modelKeys(spark))
    timed("annPanel cold, models served")(AnnPanel.annPanel(spark, d).count())
    SessionCaches.clearQueryState(spark, SessionCaches.modelKeys(spark))
    timed("annTune cold, models served")(AnnPanel.annTune(spark, d).count())
    SessionCaches.clearQueryState(spark, SessionCaches.modelKeys(spark))
    timed("knnLshTuned cold, models served")(AnnPanel.knnLshTuned(spark, d).count())
    spark.stop()
  }
}
