package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSuite, Tables}

/** True-winnowing properties (Schleimer et al. 2003): determinism, bounded
  * fingerprint density, chunking-invisibility, and the local guarantee that
  * a shared substring of length ≥ k+w-1 yields a shared fingerprint. */
class WinnowSpec extends SparkSuite {
  import spark.implicits._

  /** Writes texts as a minimal documents.parquet table and returns its dir. */
  private def docsDir(texts: Seq[String]): String = {
    val dir = tmpDir("winnow")
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "test", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("deterministic across runs and bounded density") {
    val a = TextOps.winnowFingerprint(spark, Sf).collect()
    val b = TextOps.winnowFingerprint(spark, Sf).collect()
    assert(a.sameElements(b))
    val lens = Tables.documents(spark, Sf).select($"doc_id", length($"text"))
      .as[(Long, Int)].collect().toMap
    assert(a.nonEmpty)
    a.foreach { r =>
      val nFp = r.getLong(1)
      val n = lens(r.getLong(0))
      // hard guarantee: at most one selection per window; expected ~2/(w+1)
      assert(nFp <= math.max(1, n - 8 - 16 + 2), s"doc ${r.getLong(0)}: $nFp fingerprints for $n chars")
      assert(nFp <= n * 0.5, "density far above the 2/(w+1) expectation")
    }
  }

  test("chunk boundaries are invisible (chunked == unchunked derivation)") {
    // a doc longer than the 4096-char chunk stride: the chunked engine
    // pipeline must produce exactly the fingerprint set of an unchunked
    // whole-document winnowing pass
    val rnd = new scala.util.Random(7)
    val long = (1 to 10000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val d = docsDir(Seq(long))
    val out = TextOps.winnowFingerprint(spark, d).collect()
    assert(out.length == 1)
    val set = fpSet(long)
    assert(out(0).getLong(1) == set.size.toLong, "chunking changed the fingerprint count")
    assert(out(0).getLong(2) == set.reduce(_ ^ _), "chunking changed the fingerprint set")
    assert(out(0).getLong(1) <= 10000 * 0.25)
  }

  test("graft_window_min edge cases: short input, ties, dedup") {
    graft.functions.GraftFunctions.register(spark)
    def wm(xs: Seq[Long], w: Int): Seq[Long] =
      Seq(Tuple1(xs)).toDF("hs")
        .select(call_function("graft_window_min", $"hs", lit(w))).head().getSeq[Long](0)
    assert(wm(Seq(5L, 3L), 3) == Seq.empty, "input shorter than the window -> no windows")
    assert(wm(Seq(5L, 3L, 7L), 3) == Seq(3L))
    // sliding: windows (9,2,8)->2 (2,8,1)->1 (8,1,1)->1 -> distinct [2,1]
    assert(wm(Seq(9L, 2L, 8L, 1L, 1L), 3) == Seq(2L, 1L))
    // all-equal: one distinct selection
    assert(wm(Seq(4L, 4L, 4L, 4L), 2) == Seq(4L))
  }

  /** Unchunked reference winnowing over one text via the same hash family. */
  private def fpSet(text: String): Set[Long] = {
    val k = 8; val w = 16
    Seq(Tuple1(text)).toDF("chunk")
      .select(expr(
        s"""array_distinct(transform(sequence(0, length(chunk) - ${k + w - 1}),
           |  j -> array_min(transform(sequence(j, j + ${w - 1}),
           |                 i -> xxhash64(substring(chunk, i + 1, $k))))))"""
          .stripMargin).as("fps"))
      .head().getSeq[Long](0).toSet
  }

  test("shared substring of >= k+w-1 chars yields a shared fingerprint") {
    val rnd = new scala.util.Random(11)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = rand(40) // > k+w-1 = 23
    val docA = rand(300) + shared + rand(300)
    val docB = rand(280) + shared + rand(310)
    val d = docsDir(Seq(docA, docB))
    val inter = fpSet(docA).intersect(fpSet(docB))
    assert(inter.nonEmpty, "winnowing local guarantee violated")
    // and the engine query agrees with the locally-derived set per doc
    val got = TextOps.winnowFingerprint(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    for ((doc, id) <- Seq(docA -> 0L, docB -> 1L)) {
      val set = fpSet(doc)
      assert(got(id)._1 == set.size.toLong, s"doc $id n_fp mismatch")
      assert(got(id)._2 == set.reduce(_ ^ _), s"doc $id fp_xor mismatch")
    }
  }
}
