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
}
