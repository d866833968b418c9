package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Ground truth for late-interaction MaxSim (the DuckDB oracle re-derives
  * everything; these pin the semantic property that makes MaxSim MaxSim,
  * and the exactness contracts).
  */
class LateInteractionSpec extends SparkSuite {

  test("term signs: driver twin matches the distributed embedder") {
    import spark.implicits._
    val terms = LateInteraction.Terms
    val dist = terms.toDF("t")
      .select($"t", LateInteraction.intEmbedCol($"t").as("e"))
      .as[(String, Seq[Long])].collect().toMap
    terms.foreach { t =>
      assert(dist(t) === LateInteraction.termSigns(t), s"term $t")
    }
  }

  test("maxsim rewards cross-chunk coverage over single-chunk stuffing") {
    import spark.implicits._
    // doc 1: all six query terms, but scattered one per chunk (padded so
    //        each term sits in its own 40-token window);
    // doc 2: one chunk contains two query terms, rest is filler;
    // doc 3: pure filler.
    val pad = Seq.fill(39)("filler").mkString(" ")
    val terms = LateInteraction.Terms
    val scattered = terms.map(t => s"$t $pad").mkString(" ")
    val docs = Seq(
      (1L, scattered),
      (2L, s"${terms.take(2).mkString(" ")} $pad $pad"),
      (3L, s"$pad $pad $pad")).toDF("doc_id", "text")
    val out = LateInteraction.maxsimTopKOf(docs)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(1L) > out(2L), s"coverage must win: $out")
    assert(out(2L) > out(3L), s"partial match must beat filler: $out")
  }

  test("per-doc score bounds and chunk count on the corpus") {
    val out = LateInteraction.maxsimTopK(spark, Sf).collect()
    assert(out.length === 10)
    out.foreach { r =>
      val score = r.getDouble(2)
      // each of 6 per-term max-cosines is in [-1, 1]
      assert(score >= -6.0 && score <= 6.0)
      assert(r.getLong(1) >= 1L)
    }
    // descending, ties by doc_id
    val pairs = out.map(r => (r.getDouble(2), r.getLong(0)))
    assert(pairs.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2)
    })
  }

  test("scores are partitioning-invariant (integer dots + IEEE-exact float path)") {
    val docs = graft.Tables.documents(spark, Sf)
    val a = LateInteraction.maxsimTopKOf(docs.repartition(3)).collect().toSeq
    val b = LateInteraction.maxsimTopKOf(docs.repartition(7)).collect().toSeq
    assert(a === b)
  }
}
