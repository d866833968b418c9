package graft.operators

import graft.SparkSuite

/** First-principles PCA checks — the oracle gate proves Spark≡DuckDB on
  * the eigen residual / Rayleigh quotient / projections; these prove the
  * math itself: the aggregator against a naive driver computation, the
  * eigensolver against matrix laws (orthonormality, A·v=λ·v), recovery of
  * planted principal axes, and bit-determinism across partitionings. */
class PcaSpec extends SparkSuite {

  import spark.implicits._

  private lazy val eig = Pca.eigOf(graft.Tables.embeddings(spark, Sf))

  test("quantized moments match a naive driver-side computation") {
    val df = graft.Tables.embeddings(spark, Sf)
    val rows = df.select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val d = Pca.Dim
    val naive = new Array[Long](graft.functions.CovarianceAggregator.stateLen(d))
    rows.foreach { x =>
      naive(0) += 1
      var i = 0
      while (i < d) {
        val xi = x(i).toDouble
        naive(1 + i) += math.floor(xi * 1e8).toLong
        var j = i
        while (j < d) {
          naive(graft.functions.CovarianceAggregator.momentIdx(d, i, j)) +=
            math.floor((xi * x(j).toDouble) * 1e8).toLong
          j += 1
        }
        i += 1
      }
    }
    val agg = Pca.momentsOf(df)
    assert(agg.toSeq === naive.toSeq)
  }

  test("moments are bit-identical across partitionings (order independence)") {
    val df = graft.Tables.embeddings(spark, Sf)
    val a = Pca.momentsOf(df.repartition(1))
    val b = Pca.momentsOf(df.repartition(13))
    assert(a.toSeq === b.toSeq)
  }

  test("eigenpairs satisfy the eigen equation and orthonormality") {
    val d = Pca.Dim
    for (k <- 0 until Pca.K) {
      val v = eig.vectors(k)
      val lam = eig.values(k)
      val w = Pca.covAction(eig.cov, v)
      var resid = 0.0
      var i = 0
      while (i < d) { resid = math.max(resid, math.abs(w(i) - lam * v(i))); i += 1 }
      assert(resid < 1e-9, s"component ${k + 1} residual $resid")
      // unit norm
      val n2 = v.map(x => x * x).sum
      assert(math.abs(n2 - 1.0) < 1e-10)
      // orthogonal to every later kept component
      for (k2 <- k + 1 until Pca.K) {
        val dp = v.zip(eig.vectors(k2)).map { case (a, b) => a * b }.sum
        assert(math.abs(dp) < 1e-10, s"components ${k + 1},${k2 + 1} dot $dp")
      }
    }
    // descending order, positive variance, ratios below 1
    assert(eig.values.sameElements(eig.values.sortBy(-_)))
    assert(eig.values.forall(_ > 0))
    assert(eig.values.sum <= eig.trace + 1e-9)
  }

  test("recovers planted principal axes with the pinned sign convention") {
    // planted: dim 3 has spread ±5, dim 11 spread ±2, all others constant 0
    val data = (0 until 128).map { i =>
      val v = new Array[Float](Pca.Dim)
      v(3) = if (i % 2 == 0) 5f else -5f
      v(11) = if ((i / 2) % 2 == 0) 2f else -2f
      Tuple1(v)
    }
    val df = spark.createDataFrame(data).toDF("embedding")
    val e = Pca.eigOf(df)
    // eigenvalues: var(dim3)=25, var(dim11)=4, rest ~0 (quantization dust)
    assert(math.abs(e.values(0) - 25.0) < 1e-6)
    assert(math.abs(e.values(1) - 4.0) < 1e-6)
    assert(math.abs(e.values(2)) < 1e-6)
    // axes recovered, dominant loading positive (sign convention)
    assert(math.abs(e.vectors(0)(3) - 1.0) < 1e-9)
    assert(math.abs(e.vectors(1)(11) - 1.0) < 1e-9)
  }

  test("projection variance realizes the eigenvalue; scores are centered") {
    val out = Pca.pcaProject(spark, Sf)
      .select($"pc1").as[Double].collect()
    val n = out.length.toDouble
    val mean = out.sum / n
    val variance = out.map(x => (x - mean) * (x - mean)).sum / n
    assert(math.abs(mean) < 1e-4, s"pc1 mean $mean")
    assert(math.abs(variance - eig.values(0)) / eig.values(0) < 1e-3,
      s"pc1 variance $variance vs lambda1 ${eig.values(0)}")
  }

  test("PCA re-rank reports exact brute-force cosines; full shortlist ≡ brute") {
    val emb = graft.Tables.embeddings(spark, Sf)
    val qv = emb.filter($"vec_id" === 0L)
      .select("embedding").head().getSeq[Float](0)
    val brute = Similarity.knnBrute(spark, Sf).collect()
    val bruteCos = brute.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every returned cosine must be the exact brute-force value
    Pca.knnPcaRerankOf(emb, eig, qv).collect().foreach { r =>
      val id = r.getLong(0)
      bruteCos.get(id).foreach(c => assert(r.getDouble(2) === c))
    }
    // corpus-sized shortlist removes the approximation entirely
    val full = Pca.knnPcaRerankOf(emb, eig, qv, shortlist = 100000).collect()
    assert(full.map(_.getLong(0)).toSeq === brute.map(_.getLong(0)).toSeq)
    // measured recall of the default-shortlist path at sf0.001 (isotropic
    // corpus = flat-spectrum worst case; 0.8 observed at shortlist 200 —
    // pin a floor so a silent shortlist regression fails loudly)
    val got = Pca.knnPcaRerankOf(emb, eig, qv).collect().map(_.getLong(0)).toSet
    val recall = brute.map(_.getLong(0)).count(got.contains) / 10.0
    assert(recall >= 0.7, s"PCA-shortlist recall@10 fell to $recall")
  }

  test("incremental moment refresh ≡ full rebuild, bit for bit") {
    val df = graft.Tables.embeddings(spark, Sf)
    val base = df.filter($"vec_id" < 400)
    val delta = df.filter($"vec_id" >= 400)
    // refresh = one pass over ONLY the delta + integer vector add
    val refreshed = Pca.refreshMoments(Pca.momentsOf(base), delta)
    val full = Pca.momentsOf(df)
    assert(refreshed.toSeq === full.toSeq)
    // and the served eigenbasis is therefore identical too
    val er = Pca.eigOfMoments(refreshed)
    val ef = Pca.eigOf(df)
    assert(er.values.toSeq === ef.values.toSeq)
    assert(er.vectors.map(_.toSeq).toSeq === ef.vectors.map(_.toSeq).toSeq)
  }

  test("component profile is consistent with the eigen state") {
    val rows = Pca.pcaComponents(spark, Sf).collect()
    assert(rows.length === Pca.K)
    rows.zipWithIndex.foreach { case (r, k) =>
      assert(r.getInt(0) === k + 1)
      assert(math.abs(r.getDouble(1) - eig.values(k)) < 1e-5)
      assert(r.getDouble(3) === 0.0, "eigen residual must round to zero")
      assert(r.getDouble(5) > 0, "dominant loading must be positive")
      // the reported top_dim really is the argmax of the 64 loading columns
      val loadings = (0 until Pca.Dim).map(i => r.getDouble(6 + i))
      val arg = loadings.zipWithIndex.maxBy { case (x, i) => (math.abs(x), -i) }._2
      assert(r.getInt(4) === arg + 1)
    }
  }
}
