package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.VectorOps._

/** One-off IVF index-quality measurement (run: sbt "Test/runMain
  * graft.operators.IvfTune"). Recall@10 vs brute-force ground truth,
  * averaged over 50 query vectors on the sf0.1 embeddings table, for the
  * k-means coarse quantizer vs the old first-16-vectors seeding, at
  * nProbe 2/4/8. All per-query top-10s come from ONE broadcast-join pass
  * per method (50 queries broadcast against the corpus), not 50 sequential
  * jobs. Results recorded in SCALE_NOTES.md Leg 3. */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, d).select($"vec_id", $"embedding").persist()
    val n = emb.count()
    println(s"[ivf] corpus: $n vectors")

    // 50 deterministic query vectors, excluded from the corpus side
    val qIds = emb.select($"vec_id").orderBy(xxhash64($"vec_id" + 99), $"vec_id")
      .limit(50).as[Long].collect().toSet
    val queries = emb.filter($"vec_id".isin(qIds.toSeq: _*))
      .select($"vec_id".as("q_id"), $"embedding".as("q_emb"))
    val corpus = emb.filter(!$"vec_id".isin(qIds.toSeq: _*))

    def top10(scored: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
      val w = Window.partitionBy($"q_id").orderBy($"cos".desc, $"vec_id")
      scored.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect()
        .groupBy(_._1).map { case (q, xs) => q -> xs.map(_._2).toSet }
    }

    val truth = top10(corpus.join(broadcast(queries))
      .select($"q_id", $"vec_id", cosine($"embedding", $"q_emb").as("cos")))
    println(s"[ivf] ground truth built for ${truth.size} queries")

    def centsOld: Seq[(Int, Seq[Double])] = Tables.embeddings(spark, d)
      .filter($"vec_id" < 16).orderBy($"vec_id").select($"embedding").collect()
      .zipWithIndex.map { case (r, i) => i -> r.getSeq[Float](0).map(_.toDouble).toSeq }.toSeq

    for ((label, cents) <- Seq(
        "first-16 seeds (round-1)" -> centsOld,
        "k-means (3 Lloyd iters)" -> Similarity.kmeansCentroids(spark, d),
        "k-means (10 Lloyd iters)" -> Similarity.kmeansCentroids(spark, d, iters = 10))) {
      def cellOf = greatest(cents.map { case (i, c) =>
        struct(dot($"embedding", typedlit(c)).as("d"), lit(i).as("cell")) }: _*)("cell")
      val celled = corpus.withColumn("cell", cellOf).persist()
      // cell-size balance: the quantizer's real quality signal at scale
      val sizes = celled.groupBy($"cell").count().as[(Int, Long)].collect().map(_._2)
      println(f"[ivf] $label: cells=${sizes.length} min=${sizes.min} max=${sizes.max} " +
        f"imbalance=${sizes.max.toDouble / (n.toDouble / cents.size)}%.2f")
      val qVecs = queries.as[(Long, Seq[Float])].collect()
      for (nProbe <- Seq(2, 4, 8)) {
        val probes = qVecs.map { case (qid, qv) =>
          val cs = cents.map { case (i, c) =>
            i -> c.zip(qv).map { case (a, b) => a * b }.sum }
            .sortBy(-_._2).take(nProbe).map(_._1)
          (qid, qv, cs)
        }.toSeq.toDF("q_id", "q_emb", "probe_cells")
        val got = top10(celled.join(broadcast(probes),
            array_contains($"probe_cells", $"cell"))
          .select($"q_id", $"vec_id", cosine($"embedding", $"q_emb").as("cos")))
        val recall = truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).intersect(t).size / 10.0 }.sum / truth.size
        println(f"[ivf] $label nProbe=$nProbe: recall@10 = $recall%.3f " +
          f"(scan fraction ≈ ${nProbe.toDouble / cents.size}%.2f)")
      }
      celled.unpersist(blocking = false)
    }
    spark.stop()
  }
}
