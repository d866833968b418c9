package graft.operators

import graft.SparkSuite

/** Ground truth for the RAG retrieval composite: self-retrieval exactness
  * (a query identical to a chunk's text must retrieve that chunk at
  * cosine 1), ranking/plan invariants, and the binaryFile ingest leg's
  * equality with the column-based decoder. */
class RagSpec extends SparkSuite {
  import spark.implicits._

  test("query identical to a chunk retrieves that chunk first at cos 1") {
    // doc 1's first 40 tokens form chunk 0 exactly; unrelated filler docs
    val target = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, target),
      (2L, (1 to 35).map(i => s"other$i").mkString(" ")),
      (3L, (1 to 35).map(i => s"noise$i").mkString(" "))).toDF("doc_id", "text")
    val top = Rag.retrieveTopK(docs, query = target, k = 3)
      .as[(Long, Int, Int, Double)].collect()
    assert(top.head._1 === 1L && top.head._2 === 0)
    assert(top.head._4 === 1.0, s"self-similarity must round to 1.0: ${top.head}")
    // the unrelated docs cannot tie a perfect match
    assert(top.tail.forall(_._4 < 1.0))
  }

  test("retrieval is TakeOrderedAndProject and never surfaces NaN cosines") {
    val out = Rag.chunkRetrieve(spark, Sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(8).mkString("\n"))
    val rows = out.as[(Long, Int, Int, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => !r._4.isNaN))
    // scores arrive sorted descending with deterministic tiebreaks
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("binaryFile ingest equals the column-based decoder feature-for-feature") {
    val viaFiles = Multimodal.binaryFileScan(spark, Sf)
    val plan = viaFiles.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("binaryfile"),
      plan.linesIterator.take(8).mkString("\n"))
    val a = viaFiles
      .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "ahash")
      .as[(Long, Int, Int, Double, Double, Double, Long)].collect().toSeq
    val b = Multimodal.decodeImages(spark, Sf)
      .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b", "ahash")
      .as[(Long, Int, Int, Double, Double, Double, Long)].collect().toSeq
    assert(a === b)
    // n_bytes is file-status metadata and must equal the rendered payload
    val nb = Multimodal.binaryFileScan(spark, Sf)
      .select("doc_id", "n_bytes").as[(Long, Long)].collect().toMap
    val rendered = graft.Tables.documents(spark, Sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    rendered.foreach { case (id, text) =>
      assert(nb(id) === Multimodal.renderPng(text).length.toLong)
    }
  }

  test("hybrid RRF fuses legs by 1/(60+rank) and promotes consensus documents") {
    val out = Rag.hybridRrf(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        Option(r.get(2)).map(_.asInstanceOf[Int]),
        Option(r.get(3)).map(_.asInstanceOf[Int])))
    assert(out.length == 10)
    // every fused score is exactly the RRF sum of its present ranks
    out.foreach { case (id, rrf, rs, rd) =>
      val expect = rs.map(r => 1.0 / (60 + r)).getOrElse(0.0) +
        rd.map(r => 1.0 / (60 + r)).getOrElse(0.0)
      assert(math.abs(rrf - math.rint(expect * 1e6) / 1e6) < 1e-9,
        s"doc $id: rrf $rrf vs ranks ($rs, $rd)")
    }
    // descending with deterministic tiebreaks
    assert(out.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    // a document ranked by BOTH legs must beat one ranked only once at
    // similar depth: every top-3 fused doc carries two ranks here
    assert(out.take(3).forall(r => r._3.nonEmpty && r._4.nonEmpty),
      s"top fused docs should be consensus docs: ${out.take(3).mkString(", ")}")
  }

  test("nDCG is exactly 1 when BM25 retrieves the ideal prefix") {
    // planted for eval query 1 = ("dup","hash"): three short grade-2 docs
    // that BM25 must rank first (rare term + high tf + short dl), one
    // grade-1 doc, filler with neither term. Permutations WITHIN a grade
    // class don't change DCG, so ndcg10 == 1.0 exactly.
    val docs = (
      Seq(
        (1L, "dup hash dup hash"),
        (2L, "dup hash hash dup"),
        (3L, "hash dup dup dup"),
        (4L, "hash join join join scan scan scan table table table")) ++
        (5L to 30L).map(i => i -> "scan join table row filter batch")
      ).toDF("doc_id", "text")
    val r = Rag.ndcgEvalOf(docs).collect().find(_.getInt(0) == 1).get
    assert(r.getString(1) === "dup hash")
    assert(r.getLong(2) === 4) // n_rel: 3 grade-2 + 1 grade-1
    assert(r.getDouble(5) === 1.0, s"expected perfect ndcg, got $r")
    assert(r.getDouble(3) === r.getDouble(4))
  }

  test("nDCG eval on the real corpus is well-formed and bounded") {
    val rows = Rag.ndcgEval(spark, Sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    rows.foreach { r =>
      val (nRel, dcg, idcg, ndcg) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nRel > 0)
      assert(dcg > 0 && idcg > 0 && dcg <= idcg + 1e-9, r.toString)
      assert(ndcg > 0 && ndcg <= 1.0 + 1e-9, r.toString)
    }
  }

  test("maxsim detects exact term presence: contained terms score 1.0 each") {
    // a doc containing a query term has a token whose hash equals the
    // query token's hash → xor = 0 → per-term contribution exactly 1.0;
    // a doc with neither term cannot reach 1.0 per term
    val docs = Seq(
      (1L, "dup hash filler filler"),  // both terms present → maxsim 2.0
      (2L, "dup join filler filler"),  // one term → 1.0 + noise(<1)
      (3L, "scan join filler filler")  // neither → < 2.0 strictly
    ).toDF("doc_id", "text")
    val scores = docs
      .select($"doc_id", Rag.maxsimOf(Seq("dup", "hash"), $"text").as("ms"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) === 2.0, s"both-terms doc must score exactly 2.0: $scores")
    assert(scores(2L) >= 1.0 - 1e-9 && scores(2L) < 2.0, scores.toString)
    assert(scores(3L) < 2.0, scores.toString)
    assert(scores(1L) > scores(2L) && scores(2L) > scores(3L), scores.toString)
  }

  test("rerank eval: reranker reorders the dense top-10 and never loses nDCG here") {
    val rows = Rag.rerankEval(spark, Sf).collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3, 4))
    rows.foreach { r =>
      val (nCand, dcgD, dcgR, idcg) =
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val (ndcgD, ndcgR, delta) =
        (r.getDouble(6), r.getDouble(7), r.getDouble(8))
      assert(nCand > 0 && nCand <= 50, r.toString)
      assert(dcgD >= 0 && dcgR >= 0 && idcg > 0, r.toString)
      assert(dcgD <= idcg + 1e-9 && dcgR <= idcg + 1e-9, r.toString)
      assert(math.abs(ndcgD - math.rint(dcgD / idcg * 1e6) / 1e6) < 2e-6, r.toString)
      // maxsim detects exact query-term presence — the same signal the
      // graded relevance counts — so on this corpus the reranker can
      // only improve or preserve the first stage's ranking quality
      assert(delta >= -1e-9, s"reranker lost nDCG: $r")
      assert(math.abs(delta - (ndcgR - ndcgD)) < 2e-6, r.toString)
    }
    // non-vacuity: the reranker actually CHANGES the outcome somewhere
    assert(rows.exists(_.getDouble(8) > 0),
      "reranker never improved any query — the eval is vacuous")
  }
}
