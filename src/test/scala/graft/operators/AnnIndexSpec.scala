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

  test("panel recall report equals an independent per-(method,query) recompute") {
    // round-14 verdict "Next round" #1: the report is now a 32-query
    // PANEL — recompute every per-query exact top-10 and every method's
    // per-query hits independently, then check the report's integers
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    val qs = AnnPanel.panelQueries(spark, Sf)
    assert(qs.size === 32 && qs.map(_._1).distinct.size === 32,
      "the panel must be 32 distinct query vectors")
    val panel = AnnPanel.annPanel(spark, Sf)
      .select($"method", $"qid", $"vec_id")
      .as[(String, Long, Long)].collect()
    val exact: Map[Long, Set[Long]] = panel
      .filter(_._1 == "sim_knn_brute")
      .groupBy(_._2).map { case (q, rows) => q -> rows.map(_._3).toSet }
    assert(exact.keySet === qs.map(_._1).toSet)
    exact.values.foreach(ids => assert(ids.size === 10))
    val want = AnnPanel.PanelMethodNames.map { m =>
      val mine = panel.filter(_._1 == m)
      val perQ = qs.map { case (q, _) =>
        val ids = mine.filter(_._2 == q).map(_._3)
        assert(ids.distinct.length == ids.length, s"$m qid=$q duplicate ids")
        ids.count(exact(q)).toLong
      }
      (m, 32L, mine.length.toLong, perQ.sum,
        perQ.map(_ * 100000L).sum, perQ.map(_ * 100000L).min,
        perQ.map(_ * 100000L).sum / 32L)
    }
    val got = AnnPanel.annRecallReport(spark, Sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === want.sortBy(_._1))
    // the exact row is the self-check: 10/10 on EVERY panel query — it
    // fails if the engine's brute tie-break drifts from the oracle's
    val brute = got.find(_._1 == "sim_knn_brute").get
    assert(brute._4 === 320L && brute._6 === 1000000L)
    // structural laws on the panel: rerank can only improve on its
    // quantized base, indexed variants equal their scan twins
    val sums = got.map(r => r._1 -> r._5).toMap
    assert(sums("sim_knn_pq_rerank") >= sums("sim_knn_pq"),
      "reranking candidates with exact cosines must not lose recall")
    assert(sums("sim_knn_ivf_indexed") == sums("sim_knn_ivf"))
    assert(sums("sim_knn_lsh_indexed") == sums("sim_knn_lsh"))
    info(got.map { case (n, _, _, h, _, _, _) => s"$n=$h/320" }.mkString(", "))
  }

  test("panel: indexed variants equal their scan twins row-for-row") {
    val qs = AnnPanel.panelQueries(spark, Sf)
    val ivf = AnnPanel.panelIvf(spark, Sf, qs).collect().toSeq
    val ivfIdx = AnnPanel.panelIvfIndexed(spark, Sf, qs).collect().toSeq
    assert(ivfIdx === ivf)
    val lsh = AnnPanel.panelLsh(spark, Sf, qs).collect().toSeq
    val lshIdx = AnnPanel.panelLshIndexed(spark, Sf, qs).collect().toSeq
    assert(lshIdx === lsh)
  }

  test("panel brute reproduces the single-query brute for vec_id 0") {
    // qid 0 is always on the panel (stride grid starts at 0): its panel
    // rows must be exactly knnBrute's ids in rank order
    val spark2 = spark
    import spark2.implicits._
    val single = Similarity.knnBrute(spark, Sf)
      .select($"vec_id").as[Long].collect().toSeq
    val qs = AnnPanel.panelQueries(spark, Sf)
    val panel0 = AnnPanel.panelBrute(spark, Sf, qs)
      .filter($"qid" === 0L).orderBy($"rank")
      .select($"vec_id").as[Long].collect().toSeq
    assert(panel0 === single)
  }

  test("tune advisor: recall monotone in probes/radius; one recommendation per family") {
    val spark2 = spark
    import spark2.implicits._
    val tune = AnnPanel.annTune(spark, Sf)
      .as[(String, Int, Long, Long, Long, Long, Int)].collect().toSeq
    assert(tune.map(t => (t._1, t._2)).toSet ===
      (AnnPanel.IvfProbes.map(("ivf", _)) ++ AnnPanel.LshRadii.map(("lsh", _))).toSet)
    tune.groupBy(_._1).foreach { case (fam, rows) =>
      val byParam = rows.sortBy(_._2)
      // probe/radius sets are nested -> candidates and recall both
      // non-decreasing in the param
      assert(byParam.map(_._3) === byParam.map(_._3).sorted, s"$fam candidates not monotone")
      assert(byParam.map(_._5) === byParam.map(_._5).sorted, s"$fam recall not monotone")
      val rec = rows.filter(_._7 == 1)
      assert(rec.size === 1, s"$fam must recommend exactly one operating point")
      val qualifying = rows.filter(r => r._5 >= AnnPanel.TuneFloorE6PerQuery * r._4)
      if (qualifying.nonEmpty)
        assert(rec.head._3 === qualifying.map(_._3).min,
          s"$fam must recommend the cheapest qualifying point")
      else
        assert(rec.head._5 === rows.map(_._5).max,
          s"$fam with no qualifying point must recommend max recall")
    }
  }

  test("tuned IVF serve runs at the advisor's recommended operating point") {
    val spark2 = spark
    import spark2.implicits._
    val rec = AnnPanel.annTune(spark, Sf)
      .filter($"method" === "ivf" && $"recommended" === 1)
      .select($"param").as[Int].collect().toSeq
    assert(rec.size === 1)
    val tuned = AnnPanel.knnIvfTuned(spark, Sf).collect().toSeq
    val direct = Similarity.knnIvfIndexed(spark, Sf, nProbe = rec.head).collect().toSeq
    assert(tuned === direct,
      "the execution stage must serve exactly the recommended operating point")
    // and it stays a partition-pruned index read whatever the param
    val plan = AnnPanel.knnIvfTuned(spark, Sf)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("cell")), plan)
  }

  test("tuned LSH serve runs at the advisor's recommended Hamming radius") {
    val spark2 = spark
    import spark2.implicits._
    val rec = AnnPanel.annTune(spark, Sf)
      .filter($"method" === "lsh" && $"recommended" === 1)
      .select($"param").as[Int].collect().toSeq
    assert(rec.size === 1)
    val tuned = AnnPanel.knnLshTuned(spark, Sf).collect().toSeq
    val direct = Similarity.knnLshIndexed(spark, Sf, radius = rec.head).collect().toSeq
    assert(tuned === direct,
      "the execution stage must serve exactly the recommended operating point")
    val plan = AnnPanel.knnLshTuned(spark, Sf)
      .queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(_.contains("sig")), plan)
  }

  test("filtered kNN: every pre-filter row qualifies; post-filter loses recall, never gains") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    val lang = graft.Tables.documents(spark, Sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val truth = AnnPanel.knnFilteredExact(spark, Sf)
      .select($"vec_id").as[Long].collect().toSet
    assert(truth.size === 10)
    truth.foreach(id => assert(lang(id) == "en"))
    val pre = AnnPanel.knnFilteredPre(spark, Sf)
      .select($"vec_id").as[Long].collect().toSeq
    assert(pre.size === 10 && pre.forall(lang(_) == "en"),
      "pre-filter returns a full k of qualifying rows")
    val post = AnnPanel.knnFilteredPost(spark, Sf)
      .select($"vec_id").as[Long].collect().toSeq
    assert(post.forall(lang(_) == "en"))
    // equal candidate budget (same probed cells, same shortlist depth):
    // post-filter can only surface qualifying ids the unfiltered top-10
    // happened to contain -> its recall vs the filtered truth is <= pre's
    val preRecall = pre.count(truth)
    val postRecall = post.count(truth)
    assert(postRecall <= preRecall,
      s"post-filter recall $postRecall must not beat pre-filter $preRecall at equal budget")
    assert(post.size <= pre.size, "post-filter cannot return more than the shortlist")
    // post is exactly the unfiltered top-10 intersected with the predicate
    val unfiltered = Similarity.knnIvfIndexed(spark, Sf)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(post === unfiltered.filter(lang(_) == "en"))
    info(s"recall@10 vs filtered truth: pre=$preRecall/10 post=$postRecall/10")
  }
}
