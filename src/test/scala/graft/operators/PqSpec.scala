package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** Product quantization: code width, determinism, the planted-duplicate
  * maximality guarantee (an exact copy of the query must attain the
  * globally maximal ADC score — a consequence of using the same max-dot
  * assignment in train/encode/score), and a loose quality floor of ADC
  * ranking vs exact ranking.
  */
class PqSpec extends SparkSuite {
  import spark.implicits._

  test("codes are M bytes and deterministic across invocations") {
    val emb = Tables.embeddings(spark, Sf)
    val a = Pq.encodedOf(emb, Sf).select($"vec_id", $"pq_code")
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    val b = Pq.encodedOf(emb, Sf).select($"vec_id", $"pq_code")
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(a.length == emb.count())
    a.foreach { case (_, code) =>
      assert(code.length == Pq.M)
      code.foreach(c => assert((c & 0xff) < Pq.K))
    }
    assert(a.map(_._2.toSeq).toSeq == b.map(_._2.toSeq).toSeq)
  }

  test("a planted exact duplicate of the query attains the top ADC score") {
    val emb = Tables.embeddings(spark, Sf)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    // plant a copy of the query vector under a fresh id
    val dup = emb.filter($"vec_id" === 0L)
      .select(lit(999999999L).as("vec_id"), $"embedding", $"label")
    val planted = emb.select($"vec_id", $"embedding", $"label").unionByName(dup)
    val top = Pq.knnPqOf(planted, Sf + "#planted", qv, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // max-dot assignment means the duplicate's code selects the argmax LUT
    // entry in every subspace — nothing can score higher
    assert(top.head._1 == 999999999L, top.toSeq.toString)
    assert(top.tail.forall(_._2 <= top.head._2))
  }

  test("ADC ranking overlaps exact ranking (quality floor, not exactness)") {
    val emb = Tables.embeddings(spark, Sf)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0).map(_.toDouble).toArray
    val pqTop = Pq.knnPqOf(emb, Sf, qv, k = 10).collect().map(_.getLong(0)).toSet
    // exact top-50 by raw dot product (driver-side over the small corpus)
    val exact = emb.filter($"vec_id" =!= 0L)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) => id -> v.zip(qv).map { case (a, b) => a * b }.sum }
      .sortBy(-_._2).take(50).map(_._1).toSet
    val overlap = pqTop.intersect(exact).size
    info(s"PQ top-10 ∩ exact top-50 = $overlap/10")
    // 8-byte codes of isotropic 64-dim noise: require a floor, not recall
    // (chance overlap would be ~1; see SCALE_NOTES Leg 3 on this corpus)
    assert(overlap >= 3, s"overlap $overlap")
  }

  test("re-rank reports EXACT cosines (brute-force values for its ids)") {
    val emb = Tables.embeddings(spark, Sf)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    val reranked = Pq.knnPqRerankOf(emb, Sf, qv)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // brute-force exact cosine over the whole corpus, driver-side
    val q = qv.map(_.toDouble).toArray
    val qn = math.sqrt(q.map(x => x * x).sum)
    val exact = emb.filter($"vec_id" =!= 0L)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        val vd = v.map(_.toDouble).toArray
        val vn = math.sqrt(vd.map(x => x * x).sum)
        id -> math.rint(vd.zip(q).map { case (a, b) => a * b }.sum / (vn * qn) * 1e6) / 1e6
      }.toMap
    reranked.foreach { case (id, cos) =>
      assert(math.abs(cos - exact(id)) < 1e-9,
        s"re-ranked cosine for $id is not the exact value: $cos vs ${exact(id)}")
    }
  }

  test("a corpus-sized shortlist makes re-rank equal brute force row-for-row") {
    val emb = Tables.embeddings(spark, Sf)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    val n = emb.count().toInt
    val full = Pq.knnPqRerankOf(emb, Sf, qv, k = 10, shortlist = n)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val brute = Similarity.knnBrute(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(full.toSeq == brute.toSeq)
  }

  test("re-rank is at least as good as raw ADC ranking (recall vs exact top-10)") {
    val emb = Tables.embeddings(spark, Sf)
    val qv = emb.filter($"vec_id" === 0L)
      .select($"embedding").head().getSeq[Float](0)
    val exactTop = Similarity.knnBrute(spark, Sf)
      .collect().map(_.getLong(0)).toSet
    val raw = Pq.knnPqOf(emb, Sf, qv.map(_.toDouble).toArray, k = 10)
      .collect().map(_.getLong(0)).toSet
    val rr = Pq.knnPqRerankOf(emb, Sf, qv).collect().map(_.getLong(0)).toSet
    val (rawRecall, rrRecall) =
      (raw.intersect(exactTop).size, rr.intersect(exactTop).size)
    info(s"recall@10 — raw ADC: $rawRecall/10, re-ranked: $rrRecall/10")
    // re-ranking can only fix ordering INSIDE the shortlist; with a 4k
    // shortlist it must not do worse than the raw top-k it contains
    assert(rrRecall >= rawRecall, s"re-rank lost recall: $rrRecall < $rawRecall")
  }
}
