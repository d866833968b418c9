package graft.operators

import org.apache.spark.sql.functions._

/** SCALE_NOTES Leg 20 measurement (run manually, results recorded there):
  * the two fixed-point TRAINERS at 20× corpus — LR (quality_lr_train) on
  * 100k docs and lattice k-means (sim_kmeans_assign) on 40k vectors.
  *
  * The blow-ups are verbatim copies with shifted ids, which makes the
  * correctness-at-scale invariant EXACT, not statistical: replication
  * multiplies every gradient sum AND the n in the divisor by the same
  * factor — trunc(20G / 20D) = trunc(G / D) — so the learned LR weights
  * must be bit-identical; likewise every k-means centroid mean has both
  * numerator and denominator ×20 (init centroids are the original
  * vec_id < K rows), so the centroid trajectory is bit-identical.
  * Asserted, not eyeballed.
  */
object TrainScaleTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- LR at 20× ----
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    val docs20 = (0 until 20).map { i =>
      docs.select(($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"), $"text")
    }.reduce(_ union _).localCheckpoint()
    println(s"[trainscale] lr docs=${docs20.count()}")
    LrTrain.trainOf(docs) // warmup: JIT + codegen caches
    val ((w1, b1), t1) = timed(LrTrain.trainOf(docs))
    val ((w20, b20), t20) = timed(LrTrain.trainOf(docs20))
    println(f"[trainscale] lr 1x in $t1%.2f s; 20x in $t20%.2f s; time x${t20 / t1}%.2f")
    assert(w1.toSeq == w20.toSeq && b1 == b20,
      s"LR weights must be replication-invariant:\n1x =${w1.toSeq} $b1\n20x=${w20.toSeq} $b20")
    println("[trainscale] lr weights bit-identical at 20x: OK")

    // ---- k-means at 20× ----
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select($"vec_id", $"label", $"embedding")
    val emb20 = (0 until 20).map { i =>
      emb.select(($"vec_id" + lit(i.toLong * 1000000L)).as("vec_id"),
        $"label", $"embedding")
    }.reduce(_ union _).localCheckpoint()
    println(s"[trainscale] km vecs=${emb20.count()}")
    Kmeans.trainOf(emb) // warmup
    val (c1, k1) = timed(Kmeans.trainOf(emb))
    val (c20, k20) = timed(Kmeans.trainOf(emb20))
    println(f"[trainscale] km 1x in $k1%.2f s; 20x in $k20%.2f s; time x${k20 / k1}%.2f")
    assert(c1 == c20,
      s"k-means centroids must be replication-invariant")
    println("[trainscale] km centroids bit-identical at 20x: OK")
    spark.stop()
  }
}
