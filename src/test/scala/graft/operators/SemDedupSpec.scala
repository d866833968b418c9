package graft.operators

import graft.{SparkSuite, Tables}

/** SemDeDup (k-means-cell-confined semantic dedup): planted-duplicate
  * recovery, the empty-on-isotropic-noise correctness case, and the
  * documented cell-straddle miss semantics (pinned deterministically with
  * handcrafted centroids, not corpus k-means). */
class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  test("planted exact duplicates are recovered, and nothing else clusters") {
    val out = Similarity.plantedSemDedup(spark, Sf)
      .as[(Long, Long, Long, Int)].collect()
    val nBase = Tables.embeddings(spark, Sf).count()
    val expectedPairs = (0L until nBase by 50L).toSet
    // exactly the planted (base, base + 1e9) pairs — 2 rows per pair
    assert(out.length == expectedPairs.size * 2, out.take(10).toSeq.toString)
    val byCluster = out.groupBy(_._2)
    assert(byCluster.keySet == expectedPairs)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).toSet == Set(cid, cid + 1000000000L))
      assert(members.forall(_._3 == 2L), s"cluster $cid size != 2")
      // keep elects the min-id (base) member
      assert(members.filter(_._4 == 1).map(_._1).toSeq == Seq(cid))
    }
  }

  test("isotropic corpus alone has no semantic dups (empty-but-correct)") {
    val emb = Tables.embeddings(spark, Sf).select($"vec_id", $"embedding")
    assert(Similarity.semDedupOf(spark, Sf, emb).isEmpty)
  }

  test("incremental: planted corpus dups flag dup_corpus with the source id; naturals are novel") {
    val out = Similarity.incrementalSemDedup(spark, Sf)
      .as[(Long, Option[Long], String)].collect()
    val nBase = Tables.embeddings(spark, Sf).count()
    val plantedSrcs = (0L until nBase by 50L).toSet // all %50==0 ids are corpus (%10==0)
    val naturals = (0L until nBase).filter(_ % 10 == 7).toSet
    assert(out.map(_._1).toSet == naturals ++ plantedSrcs.map(_ + 1000000000L))
    out.foreach {
      case (id, src, status) if id >= 1000000000L =>
        assert(status == "dup_corpus", s"planted $id: $status")
        assert(src.contains(id - 1000000000L), s"planted $id: dup_src $src")
      case (id, src, status) =>
        assert(status == "novel" && src.isEmpty, s"natural $id: $status/$src")
    }
  }

  test("incremental: within-batch dups elect the first occurrence (min-id), direct-pair") {
    // corpus = one isolated direction; batch = two identical arrivals plus
    // a corpus-dup arrival — exercises all three statuses in one shot
    val dim = 64
    def vec(s: Seq[Double]): Seq[Float] = (s ++ Seq.fill(dim - s.size)(0.0)).map(_.toFloat)
    val centroids = Seq(0 -> (Seq(1.0) ++ Seq.fill(dim - 1)(0.0)))
    val corpus = Seq((5L, vec(Seq(1.0, 0.1)))).toDF("vec_id", "embedding")
    val batch = Seq(
      (20L, vec(Seq(0.0, 1.0))), // novel direction, first occurrence
      (21L, vec(Seq(0.0, 1.0))), // identical to 20 -> dup_batch of 20
      (22L, vec(Seq(1.0, 0.1)))  // identical to corpus 5 -> dup_corpus
    ).toDF("vec_id", "embedding")
    val dir = tmpDir("semdedup-incr-unit")
    Similarity.writeIncrementalSemDedup(corpus, batch, centroids, 0.95, dir)
    val got = spark.read.parquet(dir)
      .as[(Long, Option[Long], String)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (20L, None, "novel"),
      (21L, Some(20L), "dup_batch"),
      (22L, Some(5L), "dup_corpus")), got.toString)
  }

  test("cell-straddling near-dups are missed — SemDeDup's documented approximation") {
    // handcrafted 2-cell geometry: a and b have cosine ~0.994 (>= 0.95)
    // but argmax-dot-assign to DIFFERENT cells, so no edge can form
    val dim = 64
    def vec(x: Double, y: Double): Seq[Float] =
      (Seq(x, y) ++ Seq.fill(dim - 2)(0.0)).map(_.toFloat)
    val centroids = Seq(0 -> vec(1, 0).map(_.toDouble), 1 -> vec(0, 1).map(_.toDouble))
    val emb = Seq((1L, vec(1.0, 0.9)), (2L, vec(0.9, 1.0)))
      .toDF("vec_id", "embedding")
    val dir = tmpDir("semdedup-straddle")
    Similarity.writeSemDedup(emb, centroids, 0.95, dir)
    assert(spark.read.parquet(dir).isEmpty,
      "pair straddles the cell boundary and must be (documentedly) missed")
    // same pair, same cell -> found: proves the miss above is the cell
    // confinement, not the cosine threshold
    val oneCell = Seq(0 -> vec(1, 1).map(_.toDouble))
    val dir2 = tmpDir("semdedup-onecell")
    Similarity.writeSemDedup(emb, oneCell, 0.95, dir2)
    val found = spark.read.parquet(dir2)
      .as[(Long, Long, Long, Int)].collect().sortBy(_._1)
    assert(found.map(t => (t._1, t._2, t._3, t._4)).toSeq
      == Seq((1L, 1L, 2L, 1), (2L, 1L, 2L, 0)))
  }
}
