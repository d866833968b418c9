package graft.operators

import graft.SparkSuite

/** Ground truth for the end-to-end curation composite
  * (Dedup.dedupPipeline): a hand-built corpus where every stage's drop
  * set is known exactly — an exact-dup pair, a near-dup pair the LSH
  * pipeline must catch, an embedding-identical semantic pair, a doc
  * without an embedding that must pass through, plus the query's own
  * planted twins (doc 0 hits both the %25 exact and %50 semantic
  * planting rules). The oracle re-derives the counts in DuckDB; this
  * spec pins WHICH documents each stage drops. */
class DedupPipelineSpec extends SparkSuite {
  import spark.implicits._

  test("each stage drops exactly its planted duplicates") {
    val dir = tmpDir("dedup-pipeline")
    val vocab = (1 to 60).map(i => s"w$i")
    val textA = vocab.mkString(" ")
    // near-dup of A: 55 of 60 tokens shared (Jaccard ~0.83 on shingles),
    // strictly fewer characters so keep-best elects A
    val textB = (vocab.take(55) ++ (1 to 5).map(i => s"z$i")).mkString(" ")
    def uniq(tag: String) = (1 to 30).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (0L, uniq("u")),   // planted by the query itself: +1e6 exact, +2e6 sem
      (1L, textA),
      (2L, textB),       // near-dup of 1 -> dropped in stage 2 (shorter)
      (3L, textA),       // exact dup of 1 -> dropped in stage 1
      (4L, uniq("p")),
      (5L, uniq("q")))   // embedding-identical to 4 -> dropped in stage 3
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)(r.nextGaussian().toFloat)
    }
    val e0 = vec(7); val e4 = vec(11)
    // doc 1 (and 2, 3) deliberately have NO embedding row: partial
    // embedding coverage must pass those docs through stage 3 untouched
    Seq((0L, e0, 0), (4L, e4, 0), (5L, e4, 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = Dedup.dedupPipeline(spark, dir)
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    // corpus0 = 6 docs + exact twin of 0 (+1e6) + sem twin of 0 (+2e6)
    // stage 1 drops {3, 1000000} (exact text dups, min-id election)
    // stage 2 drops {2} (near-dup cluster {1,2} after 3 fell; A is longer)
    // stage 3 drops {5, 2000000} (cos-1 partners 4 and 0 survive as min ids)
    assert(out === Seq(
      (1, "exact", 8L, 2L, 6L),
      (2, "near_dup", 6L, 1L, 5L),
      (3, "semantic", 5L, 2L, 3L)), out.toString)
  }

  test("real-corpus run obeys the chaining and planting laws") {
    val nDocs = graft.Tables.documents(spark, Sf).count()
    val nExactTwins = graft.Tables.documents(spark, Sf)
      .filter($"doc_id" % 25 === 0).count()
    val nSemTwins = graft.Tables.documents(spark, Sf)
      .filter($"doc_id" % 50 === 0).count()
    val rows = Dedup.dedupPipeline(spark, Sf)
      .as[(Int, String, Long, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq(1, 2, 3))
    // chaining: each stage consumes the previous stage's survivors
    assert(rows(0)._3 === nDocs + nExactTwins + nSemTwins)
    assert(rows(1)._3 === rows(0)._5 && rows(2)._3 === rows(1)._5)
    rows.foreach { r =>
      assert(r._4 >= 0 && r._5 === r._3 - r._4, r.toString)
    }
    // stage 1 drops AT LEAST the planted exact twins (plus any natural
    // text dups the corpus carries); stage 3 at MOST the planted
    // semantic twins (a twin survives if its source fell in stage 2 or
    // has no embedding)
    assert(rows(0)._4 >= nExactTwins, rows.toString)
    assert(rows(2)._4 <= nSemTwins, rows.toString)
    assert(rows(2)._4 > 0, "semantic stage must drop some planted twins")
  }
}
