package graft.operators

import graft.SparkSuite

/** Ground truth for the corpus-internal n-gram novelty score
  * (TextOps.gramNovelty): exact duplicates score 0, unique prose scores
  * 1e6, partial overlap computes to the exact integer share, and the
  * short-doc whole-text-gram edge holds. */
class GramNoveltySpec extends SparkSuite {
  import spark.implicits._

  test("planted duplicates, partial overlap, and short docs score exactly") {
    val dir = tmpDir("gram-novelty")
    val core = (1 to 15).map(i => s"c$i").mkString(" ") // 8 shared 8-grams
    val docs = Seq(
      (1L, core + " " + (1 to 8).map(i => s"x$i").mkString(" ")),
      (2L, core + " " + (1 to 8).map(i => s"y$i").mkString(" ")),
      (3L, (1 to 20).map(i => s"u$i").mkString(" ")), // fully unique
      (4L, "tiny doc"),                               // <8 words: one gram
      (5L, "tiny doc"))                               // exact short twin
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextOps.gramNovelty(spark, dir)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // docs 1/2: 23 words -> 16 grams each; the 8 grams fully inside the
    // 15-word core are shared, the 8 straddling/tail grams are private
    assert(got(1L) === (1L, 16L, 8L, 500000L), got.toString)
    assert(got(2L) === (2L, 16L, 8L, 500000L), got.toString)
    assert(got(3L) === (3L, 13L, 0L, 1000000L), got.toString)
    // short twins: one whole-text gram each, shared -> novelty 0
    assert(got(4L) === (4L, 1L, 1L, 0L), got.toString)
    assert(got(5L) === (5L, 1L, 1L, 0L), got.toString)
  }

  test("real corpus: bounded, ordered, and near-dup docs score lower") {
    val rows = TextOps.gramNovelty(spark, Sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, sh, nov) =>
      assert(n >= 1 && sh >= 0 && sh <= n)
      assert(nov == 1000000L * (n - sh) / n)
    }
    // the corpus's known near-dup cluster members must average lower
    // novelty than the corpus at large (their grams exist elsewhere)
    val clustered = Dedup.nearDupClusters(spark, Sf)
      .select("doc_id").as[Long].collect().toSet
    assert(clustered.nonEmpty)
    val (inC, outC) = rows.partition(r => clustered(r._1))
    def mean(xs: Array[(Long, Long, Long, Long)]) =
      xs.map(_._4).sum.toDouble / xs.length
    assert(mean(inC) < mean(outC),
      s"clustered docs should be less novel: ${mean(inC)} vs ${mean(outC)}")
  }
}
