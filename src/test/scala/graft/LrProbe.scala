package graft.operators

/** Phase probe for quality_agreement_kappa (guide §1). */
object LrProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = graft.Tables.documents(spark, d)
    LrTrain.agreementKappa(spark, d).count() // warmup
    SessionCaches.clear(spark)
    timed("1 featuresOf (noop)")(noop(LrTrain.featuresOf(docs)))
    timed("2 trainOf full (ckpt + 8 iters)")(LrTrain.trainOf(docs))
    timed("3 rule classifier (noop)")(noop(Classifier.qualityClassifierOf(docs)))
    SessionCaches.clear(spark)
    timed("4 kappa cold")(LrTrain.agreementKappa(spark, d).count())
    timed("5 kappa warm-model")(LrTrain.agreementKappa(spark, d).count())
    spark.stop()
  }
}
