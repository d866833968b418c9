package graft.operators

import graft.SparkSuite

/** Ground truth for the retrieval family: BM25 against an independent
  * hand-rolled scorer on a tiny corpus, bigram mining against counted
  * expectations, and the keep-best election invariants on the real
  * corpus (the oracle gate separately proves Spark≡DuckDB for the two
  * SQL-expressible queries). */
class SearchSpec extends SparkSuite {
  import spark.implicits._

  test("bm25 matches an independent plain-Scala scorer on a tiny corpus") {
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "a d d e"),
      (3L, "f g h i")).toDF("doc_id", "text")
    val got = Search.bm25TopKOf(docs, terms = Seq("a", "d"), k = 10)
      .as[(Long, Double)].collect().toMap

    // independent arithmetic (plain doubles, no Spark expressions)
    val n = 3.0; val avgdl = 4.0
    def idf(df: Long) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Long, dl: Long) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Map(
      1L -> r4(idf(2) * w(2, 4)),
      2L -> r4(idf(2) * w(1, 4) + idf(1) * w(2, 4)))
    assert(got === expected)
    // d2 holds the rarer term twice -> must outrank d1
    assert(got(2L) > got(1L))
  }

  test("bm25 ranking is TakeOrderedAndProject (driver sees only k rows)") {
    val plan = Search.bm25TopK(spark, Sf).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      plan.linesIterator.take(8).mkString("\n"))
  }

  test("top bigrams counts overlapping windows exactly") {
    val docs = Seq(
      (1L, "x y x y"),
      (2L, "y x"),
      (3L, "solo")).toDF("doc_id", "text")
    val got = Search.topBigramsOf(docs, k = 10).as[(String, Long)].collect().toSeq
    // "x y x y" -> [x y, y x, x y]; "y x" -> [y x]; "solo" has no bigram
    assert(got === Seq("x y" -> 2L, "y x" -> 2L))
  }

  test("indexed bm25 ≡ from-scratch bm25, with term-bucket partition pruning") {
    val scan = Search.bm25TopK(spark, Sf).as[(Long, Double)].collect().toSeq
    val viaIndex = Search.bm25TopKIndexed(spark, Sf)
    val got = viaIndex.as[(Long, Double)].collect().toSeq
    assert(got === scan)
    // the postings scan must be pruned on the term-hash bucket partitions
    val plan = viaIndex.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.isDefined, plan.linesIterator.take(12).mkString("\n"))
    assert(pf.get.contains("bucket"), pf.get)
  }

  test("keep-best elects the longest member of every near-dup cluster") {
    val clusters = Dedup.nearDupClusters(spark, Sf)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect()
    assert(clusters.nonEmpty)
    val chars = graft.Tables.documents(spark, Sf)
      .select("doc_id", "n_chars").as[(Long, Long)].collect().toMap
    val kept = Dedup.keepBestClusters(spark, Sf)
      .as[(Long, Long, Long, Long, Int)].collect()
    val byCluster = clusters.groupBy(_._2)
    assert(kept.map(_._1).toSet === byCluster.keySet, "one row per cluster")
    kept.foreach { case (cid, keptDoc, nMembers, keptChars, differs) =>
      val members = byCluster(cid).map(_._1)
      assert(nMembers === members.length)
      // elected = max by (n_chars desc, doc_id asc)
      val expect = members.minBy(id => (-chars(id), id))
      assert(keptDoc === expect, s"cluster $cid kept $keptDoc, want $expect")
      assert(keptChars === chars(keptDoc))
      assert((differs == 1) === (keptDoc != cid))
    }
  }
}
