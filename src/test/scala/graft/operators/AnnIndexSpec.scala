package graft.operators

import graft.SparkSuite

/** Materialized ANN indexes (round-3 verdict #3): the indexed kNN variants
  * must (a) return exactly what the scan variants return — the index is a
  * layout change, not a semantics change — and (b) plan the probe as a
  * PARTITION filter, so the scan lists only the probed cell/sig
  * directories instead of computing assignments over the full corpus per
  * query. (b) is the 100 TB property: probing is directory pruning, the
  * same mechanism BucketedSpec/ZOrderSpec pin for relational tables.
  */
class AnnIndexSpec extends SparkSuite {

  private def scanOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("IVF indexed kNN matches the scan variant exactly") {
    val scan = Similarity.knnIvf(spark, Sf).collect().toSeq
    val indexed = Similarity.knnIvfIndexed(spark, Sf).collect().toSeq
    assert(indexed == scan)
  }

  test("LSH indexed kNN matches the scan variant exactly") {
    val scan = Similarity.knnLsh(spark, Sf).collect().toSeq
    val indexed = Similarity.knnLshIndexed(spark, Sf).collect().toSeq
    assert(indexed == scan)
  }

  test("IVF probe is a partition filter on the materialized index") {
    val plan = scanOf(Similarity.knnIvfIndexed(spark, Sf))
    assert(plan.contains("PartitionFilters"), plan)
    // the cell probe must appear in PartitionFilters (directory pruning),
    // NOT as a post-scan Filter over a computed column
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).get
    assert(pf.contains("cell"), pf)
  }

  test("LSH probe is a partition filter on the materialized index") {
    val plan = scanOf(Similarity.knnLshIndexed(spark, Sf))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, plan)
    assert(pf.get.contains("sig"), pf.get)
  }

  test("planted embedding clusters recover exactly the planted pairs") {
    val out = Similarity.plantedEmbeddingClusters(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val nBase = graft.Tables.embeddings(spark, Sf).count()
    val planted = graft.Tables.embeddings(spark, Sf)
      .filter(org.apache.spark.sql.functions.col("vec_id") % 50 === 0)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // exactly the planted pairs cluster: each source vec with its +1e9 copy
    assert(out.length == 2 * planted.size, s"rows=${out.length} planted=${planted.size} base=$nBase")
    planted.foreach { v =>
      val cluster = out.filter(_._2 == v)
      assert(cluster.map(_._1).toSet == Set(v, v + 1000000000L), s"vec $v: ${cluster.toSeq}")
      assert(cluster.forall(_._3 == 2L))
      // representative (min id = the source) is the keeper
      assert(cluster.filter(_._4 == 1).map(_._1).toSeq == Seq(v))
    }
  }

  test("MMR skips a planted near-duplicate that pure relevance would rank second") {
    import spark.implicits._
    // query = e1; candidates: two near-identical high-rel vectors (1, 2),
    // one orthogonal-ish diverse vector (3), filler (4..40) far away.
    // Pure relevance ranks 1 then 2; MMR must pick 3 at rank 2 because
    // sim(2, 1) ≈ 1 wipes out 2's relevance edge.
    val dim = 8
    def vec(xs: Double*): Seq[Float] = {
      val a = xs.toArray.padTo(dim, 0.0); a.map(_.toFloat).toSeq
    }
    // query (1,1): c1 highest rel; c2 a near-identical copy of c1 (their
    // mutual cosine ≈ 1 erases c2's MMR score); c3 mirrored across the
    // query — same-ish relevance, low similarity to c1 (≈0.46). Fillers
    // are near-orthogonal with tiny relevance. Pure relevance ranks
    // (c1, c2, …); MMR must rank (c1, c3, …) and still admit c2 later
    // (10 candidates, k = 10, so everything is eventually selected).
    val rows = Seq(
      0L -> vec(1.0, 1.0),             // the query
      1L -> vec(1.0, 0.25),
      2L -> vec(1.0, 0.249),           // near-dup of 1
      3L -> vec(0.24, 1.0)) ++         // diverse
      (4L to 10L).map(i => i -> vec(0.0, 0.05, 1.0, i.toDouble / 100))
    val emb = rows.toDF("vec_id", "embedding")
    val got = Similarity.mmrSelectOf(emb)
      .select($"rank", $"vec_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got.head == ((1, 1L)), s"rank 1 must be the top-relevance vector: $got")
    assert(got(1)._2 == 3L, s"rank 2 must be the diverse vector, not the near-dup: $got")
    // with 10 candidates and k=10 the near-dup still appears, just demoted
    assert(got.map(_._2).contains(2L), s"near-dup should still appear later: $got")
    assert(got.find(_._2 == 2L).get._1 > 2, "near-dup must be demoted below rank 2")
    assert(got.map(_._2).distinct.size == got.size)
  }

  test("ANN recall report equals an independent per-method recompute") {
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val exact = Similarity.knnBrute(spark, Sf)
      .select($"vec_id").as[Long].collect().toSet
    assert(exact.size === 10)
    val want = Similarity.RecallMethods.map { case (name, fn) =>
      val ids = fn(spark, Sf).select(col("vec_id")).as[Long].collect()
      assert(ids.length <= 10 && ids.distinct.length == ids.length,
        s"$name returned ${ids.length} rows (dups?)")
      val hits = ids.count(exact).toLong
      (name, ids.length.toLong, hits, 100000L * hits)
    }
    val got = Similarity.annRecallReport(spark, Sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === want.sortBy(_._1))
    assert(got.map(_._1).toSet === Similarity.RecallMethods.map(_._1).toSet,
      "every shipped ANN variant must appear in the report")
    got.foreach { case (name, ret, hit, rec) =>
      assert(hit <= ret && rec == 100000L * hit, s"$name arithmetic")
    }
    // structural recall laws (the isotropic corpus is HARD for coarse
    // quantizers — pq honestly sits at 1/10 here, which is exactly the
    // readout this report exists to surface — so no absolute floor):
    // an exact-cosine rerank can only improve on its quantized base,
    // and the indexed variants must equal their scan twins bit-for-bit
    val byName = got.map(r => r._1 -> r._3).toMap
    assert(byName("sim_knn_pq_rerank") >= byName("sim_knn_pq"),
      "reranking candidates with exact cosines must not lose recall")
    assert(byName("sim_knn_ivf_indexed") == byName("sim_knn_ivf"))
    assert(byName("sim_knn_lsh_indexed") == byName("sim_knn_lsh"))
    info(got.map { case (n, _, h, _) => s"$n=$h/10" }.mkString(", "))
  }
}
