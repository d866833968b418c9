package graft.operators

import graft.SparkSuite

/** Ground truth for the k-means clustering profile: hand-planted cells
  * with exact cohesion/purity, plus corpus-level invariants (the query is
  * rows-only — no SQL oracle can express the iterative quantizer). */
class KmeansProfileSpec extends SparkSuite {

  import spark.implicits._

  test("profile assigns argmax-cosine cells with exact cohesion and purity") {
    val cents = Seq(0 -> Seq(1.0, 0.0), 1 -> Seq(0.0, 1.0))
    val emb = Seq(
      (Array(4f, 0f), 1), // cell 0, cos 1.0
      (Array(3f, 1f), 2), // cell 0, cos 3/√10 ≈ 0.9487
      (Array(0f, 5f), 3), // cell 1, cos 1.0
      (Array(1f, 3f), 3)  // cell 1, cos 3/√10
    ).toDF("embedding", "label")
    val out = Similarity.kmeansProfileOf(emb, cents)
      .as[(Int, Long, Double, Int, Double)].collect().toSeq
    // avg cos per cell = (1 + 0.948683…)/2 → 0.9743; cell 0 labels {1,2}
    // tie → smaller label wins; cell 1 pure label 3
    assert(out === Seq(
      (0, 2L, 0.9743, 1, 0.5),
      (1, 2L, 0.9743, 3, 1.0)))
  }

  test("corpus profile covers every vector across the 16 quantizer cells") {
    val prof = Similarity.kmeansProfile(spark, Sf)
      .as[(Int, Long, Double, Int, Double)].collect().toSeq
    val nVec = graft.Tables.embeddings(spark, Sf).count()
    assert(prof.map(_._2).sum === nVec)
    assert(prof.map(_._1).distinct.size === prof.size && prof.size <= 16)
    assert(prof.forall(r => r._3 > 0.0 && r._3 <= 1.0))
    assert(prof.forall(r => r._5 > 0.0 && r._5 <= 1.0))
  }
}
