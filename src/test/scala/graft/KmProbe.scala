package graft.operators

import org.apache.spark.sql.functions._

/** Inner-phase probe for the k-means trainer. */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    import graft.functions.VectorOps.dot
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    val k = 16
    val emb = graft.Tables.embeddings(spark, d).select($"vec_id", $"embedding")
    emb.count() // warm scan
    def normalize(v: Seq[Double]): Seq[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    var cents: Seq[(Int, Seq[Double])] = null
    timed("init sample") {
      cents = emb.orderBy(xxhash64($"vec_id"), $"vec_id").limit(k)
        .select($"embedding").collect()
        .zipWithIndex.map { case (r, i) => i -> normalize(r.getSeq[Float](0).map(_.toDouble)) }.toSeq
    }
    val cents0 = cents
    for (it <- 1 to 3) {
      timed(s"iteration $it (old shape)") {
        def cell = greatest(cents.map { case (i, c) =>
          struct(dot($"embedding", typedlit(c)).as("d"), lit(i).as("cell")) }: _*)("cell")
        val means = emb
          .select(cell.as("cell"), posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"cell", $"pos").agg(avg($"v").as("m"))
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
          .groupBy(_._1).map { case (c, rows) =>
            c -> normalize(rows.sortBy(_._2).map(_._3).toSeq) }
        cents = cents.map { case (i, old) => i -> means.getOrElse(i, old) }
      }
    }
    val oldFinal = cents
    cents = cents0
    for (it <- 1 to 3) {
      timed(s"iteration $it (2D-literal shape)") {
        val byId = cents.sortBy(_._1)
        require(byId.map(_._1) == (0 until k), "dense ids")
        val cArr = typedlit(byId.map(_._2))
        val cell = greatest((0 until k).map(i =>
          struct($"dists"(i).as("d"), lit(i).as("cell"))): _*)("cell")
        val means = emb
          .select($"embedding",
            transform(cArr, c => dot($"embedding", c)).as("dists"))
          .select(cell.as("cell"), posexplode($"embedding").as(Seq("pos", "v")))
          .groupBy($"cell", $"pos").agg(avg($"v").as("m"))
          .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
          .groupBy(_._1).map { case (c, rows) =>
            c -> normalize(rows.sortBy(_._2).map(_._3).toSeq) }
        cents = cents.map { case (i, old) => i -> means.getOrElse(i, old) }
      }
    }
    println("PROBE identical_final_centroids = " + (oldFinal == cents))
    spark.stop()
  }
}
