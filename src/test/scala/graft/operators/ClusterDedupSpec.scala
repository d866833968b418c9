package graft.operators

import graft.SparkSuite

/** Connected-components dedup clustering: exact component recovery on
  * handcrafted graphs (incl. transitive chains longer than one hop) and
  * the end-to-end keep-list invariants on the real corpus. */
class ClusterDedupSpec extends SparkSuite {
  import spark.implicits._

  // both execution paths of the size-adaptive CC: the driver union-find
  // (default below the edge ceiling) and the distributed min-label loop
  private def components(edges: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap

  private def componentsDistributed(edges: (Long, Long)*): Map[Long, Long] =
    Dedup.connectedComponentsDistributed(edges.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap

  test("recovers components exactly, including transitive chains (both paths)") {
    // {1,2,3} via chain 1-2-3 (no 1-3 edge), {10,11}, {20,21,22} star on 21
    val edges = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 21L -> 20L, 21L -> 22L)
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L)
    assert(components(edges: _*) == want)
    assert(componentsDistributed(edges: _*) == want)
  }

  test("long path converges within the iteration bound (both paths)") {
    // a 9-hop path: worst diameter case for min-label propagation
    val edges = (0L until 9L).map(i => i -> (i + 1))
    assert(components(edges: _*).values.toSet == Set(0L))
    assert(componentsDistributed(edges: _*).values.toSet == Set(0L))
  }

  test("driver union-find and distributed loop agree on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(600)((rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .filter(e => e._1 != e._2)
    assert(components(edges: _*) == componentsDistributed(edges: _*))
  }

  test("corpus keep-list invariants: one representative per cluster") {
    for (clusters <- Seq(
        Dedup.nearDupClusters(spark, Sf),
        Dedup.simhashClusters(spark, Sf))) {
      val out = clusters.as[(Long, Long, Long, Int)].collect()
      assert(out.nonEmpty, "sf0.001 corpus has near-dup groups -> clusters must exist")
      val byCluster = out.groupBy(_._2)
      byCluster.foreach { case (cid, members) =>
        assert(members.count(_._4 == 1) == 1, s"cluster $cid needs exactly one keep")
        assert(members.minBy(_._1)._1 == cid, s"cluster id must be the min doc id")
        assert(members.forall(_._3 == members.length), s"cluster_size wrong for $cid")
        assert(members.length >= 2, s"singleton cluster $cid should not appear")
      }
    }
  }

  test("embedding evidence recovers planted clusters (synthetic replicas)") {
    // the sf corpora are isotropic noise (no cos>=0.95 pairs exist — the
    // correct cluster answer there is 'none'), so plant ground truth:
    // 40 base vectors x 5 small-noise replicas -> 40 recoverable clusters
    val dir = tmpDir("emb-clusters")
    val byBase = (0 until 40).map { b =>
      val baseRnd = new scala.util.Random(1000 + b)
      Array.fill(64)(baseRnd.nextGaussian().toFloat)
    }
    val planted = for (b <- 0 until 40; r <- 0 until 5) yield {
      val n = new scala.util.Random(b * 100 + r)
      val v = byBase(b).map(x => x + 0.02f * n.nextGaussian().toFloat)
      (b * 5L + r, v.toSeq, b)
    }
    planted.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Similarity.embeddingClusters(spark, dir, minCos = 0.95)
      .as[(Long, Long, Long, Int)].collect()
    assert(out.length == 200, s"all 200 planted vectors must cluster, got ${out.length}")
    val clusters = out.groupBy(_._2)
    assert(clusters.size == 40, s"expected 40 planted clusters, got ${clusters.size}")
    clusters.foreach { case (cid, ms) =>
      assert(ms.length == 5 && ms.count(_._4 == 1) == 1)
      // every member shares the representative's base group
      assert(ms.map(_._1 / 5).distinct.length == 1, s"cluster $cid mixed bases")
    }
  }

  test("simhash banding: any Hamming<=3 pair shares a block key (pigeonhole)") {
    import spark.implicits._
    // the regression the 2x32-band shape missed: one differing bit in
    // EACH half (Hamming 2, well under the cluster threshold) matched
    // neither 32-bit band key and the pair was silently never a candidate
    val base = 0x1234_5678_9ABC_DEF0L
    val crossHalf = base ^ (1L << 5) ^ (1L << 40)
    val threeBits = base ^ (1L << 3) ^ (1L << 21) ^ (1L << 55) // 3 blocks hit
    val fourBits = base ^ (1L << 3) ^ (1L << 21) ^ (1L << 37) ^ (1L << 55)
    val hashed = Seq((1L, base), (2L, crossHalf), (3L, threeBits), (4L, fourBits))
      .toDF("doc_id", "simhash")
    val keys = Dedup.simhashBandKeys(hashed)
      .select($"doc_id", $"band", $"key").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    def collides(a: Long, b: Long) = (keys(a) & keys(b)).nonEmpty
    assert(collides(1L, 2L), "cross-half Hamming-2 pair must be a candidate")
    assert(collides(1L, 3L), "Hamming-3 pair must be a candidate (pigeonhole)")
    // 4 bits covering all 4 blocks is the first shape banding CAN miss —
    // pin the boundary so a future block-count change is a conscious one
    assert(!collides(1L, 4L),
      "all-blocks-hit Hamming-4 is outside the banding guarantee")
  }

  test("minhash and simhash evidence overlap but measure different similarity") {
    // The signals are intentionally different: minhash works on ORDERED
    // 3-gram shingles, simhash on the token SET — a reordered document is
    // a simhash dup but not a shingle dup. On this corpus the measured
    // cluster-pair overlap is ~0.25; the assertion pins that they share a
    // real common core (both catch the strongest dups) without pretending
    // they are the same metric.
    val mh = Dedup.nearDupClusters(spark, Sf)
      .as[(Long, Long, Long, Int)].collect().groupBy(_._2).values
      .flatMap(ms => ms.map(_._1).sorted.combinations(2).map(_.toSeq)).toSet
    val sh = Dedup.simhashClusters(spark, Sf)
      .as[(Long, Long, Long, Int)].collect().groupBy(_._2).values
      .flatMap(ms => ms.map(_._1).sorted.combinations(2).map(_.toSeq)).toSet
    assert(mh.nonEmpty && sh.nonEmpty)
    val overlap = mh.intersect(sh).size.toDouble / math.min(mh.size, sh.size)
    assert(overlap >= 0.15, f"near-dup signals share no common core: overlap $overlap%.2f")
  }

  // --- incremental label maintenance (refreshClusterLabels) -------------

  private def refresh(base: Seq[(Long, Long)], delta: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.refreshClusterLabels(
      Dedup.connectedComponents(base.toDF("doc_a", "doc_b"))
        .toDF("doc_id", "cluster_id"),
      delta.toDF("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toMap

  test("label refresh ≡ full rebuild on every planted delta shape") {
    val base = Seq(1L -> 2L, 2L -> 3L, 10L -> 11L, 21L -> 20L, 21L -> 22L)
    // each delta exercises one maintenance case:
    //   merge two existing clusters, brand-new cluster, new node joining
    //   an old cluster, intra-cluster no-op edge, chain merging THREE
    //   clusters through a new node
    val deltas = Seq(
      Seq(3L -> 10L),
      Seq(30L -> 31L),
      Seq(5L -> 11L),
      Seq(1L -> 3L),
      Seq(10L -> 40L, 40L -> 20L, 2L -> 40L))
    for (delta <- deltas) {
      val want = components(base ++ delta: _*)
      assert(refresh(base, delta) == want, s"delta $delta diverged from rebuild")
    }
  }

  test("label refresh ≡ full rebuild on the corpus's real pair evidence") {
    // the registered query's exact split: % 10 == 7 docs play the batch,
    // every edge touching one is the delta; refresh over the frozen base
    // labels must reproduce nearDupClusters' from-scratch labels exactly
    val full = Dedup.nearDupClusters(spark, Sf)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    val incr = Dedup.incrementalClusterRefresh(spark, Sf)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(incr == full)
  }

  test("refresh leaves untouched components' labels bit-identical") {
    val base = Seq(1L -> 2L, 10L -> 11L, 20L -> 21L)
    val got = refresh(base, Seq(1L -> 30L))
    // clusters {10,11} and {20,21} are untouched by the delta
    assert(got(10L) == 10L && got(11L) == 10L)
    assert(got(20L) == 20L && got(21L) == 20L)
    // the touched one absorbed the new node under the same min label
    assert(got(30L) == 1L && got(1L) == 1L && got(2L) == 1L)
  }
}
