package graft.operators

import graft.SparkSuite

/** Ground-truth checks for the corpus-level dedup/decontamination family
  * on hand-built corpora where the expected answer is derivable by hand —
  * the oracle gate only proves Spark≡DuckDB, not that both compute the
  * intended thing. */
class CorpusDedupSpec extends SparkSuite {

  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ten-token segments with distinct vocabularies
  private def seg(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")

  test("segment dedup keeps exactly the corpus-wide first occurrence") {
    val d = docs(
      1L -> s"${seg("s1x")} ${seg("s2x")}", // both novel
      2L -> s"${seg("s1x")} ${seg("s3x")}", // s1 repeated from doc 1
      3L -> "p1 p2 p3", // single partial segment
      4L -> s"${seg("s4x")} ${seg("s4x")}") // self-repetition
    val out = CorpusDedup.segmentDedupStats(d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 2L, 1L, 0.5),
      (3L, 1L, 1L, 1.0),
      (4L, 2L, 1L, 0.5)))
  }

  test("substring spans merge adjacent duplicated windows; same-doc repeats excluded") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")        // the shared run
    val c8 = (1 to 8).map(i => s"c$i").mkString(" ")
    val d = docs(
      10L -> a,                                             // run at pos 0
      11L -> s"x1 x2 $a z1",                                // run at pos 2
      12L -> s"$c8 m $c8",                                  // repeat within ONE doc only
      13L -> (1 to 12).map(i => s"u$i").mkString(" "))      // unique
    val out = CorpusDedup.substringSpanStats(d)
      .as[(Long, Int, Int, Long)].collect().toSeq
    // doc 10: windows 0,1,2 all occur in doc 11 → one span covering tokens 0-9
    // doc 12: its repeated 8-gram spans only one distinct doc → no rows
    assert(out === Seq(
      (10L, 0, 9, 3L),
      (11L, 2, 11, 3L)))
  }

  test("decontamination flags only training docs sharing an eval n-gram") {
    val e = (1 to 10).map(i => s"e$i").mkString(" ")
    val d = docs(
      10L -> e,                                             // eval (10 % 10 == 0)
      20L -> (1 to 8).map(i => s"f$i").mkString(" "),       // eval, unshared
      13L -> s"g1 g2 ${(1 to 8).map(i => s"e$i").mkString(" ")}", // 1 window hit
      14L -> (1 to 10).map(i => s"h$i").mkString(" "))      // clean
    val out = CorpusDedup.decontaminateStats(d, evalMod = 10)
      .as[(Long, Long)].collect().toSeq
    assert(out === Seq(13L -> 1L))
  }

  test("decontamination probes a broadcast of the eval n-gram set") {
    val plan = CorpusDedup.decontaminate(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.linesIterator.take(8).mkString("\n"))
  }

  test("bloom-prefiltered decontamination is byte-identical to the exact plan") {
    val exact = CorpusDedup.decontaminate(spark, Sf).as[(Long, Long)].collect().toSeq
    val viaBloom = CorpusDedup.decontaminateBloom(spark, Sf).as[(Long, Long)].collect().toSeq
    assert(exact.nonEmpty) // the fixture corpus must actually be contaminated
    assert(viaBloom === exact)
  }

  test("bloom prefilter discards most clean training windows before the join") {
    val w = CorpusDedup.tokenWindows(graft.Tables.documents(spark, Sf))
    val evalGrams = w.filter($"doc_id" % CorpusDedup.EvalMod === 0).select($"h").distinct()
    val bf = evalGrams.stat.bloomFilter("h", 200000L, 0.01)
    val probe = org.apache.spark.sql.functions.udf((h: String) => bf.mightContainString(h))
    val train = w.filter($"doc_id" % CorpusDedup.EvalMod =!= 0)
    val nTrain = train.count()
    val nCandidates = train.filter(probe($"h")).count()
    val nTrueHits = train.join(evalGrams, Seq("h"), "left_semi").count()
    assert(nCandidates >= nTrueHits)          // no false negatives, ever
    assert(nCandidates < nTrain / 5,          // join input shrank ≥5×
      s"candidates $nCandidates of $nTrain train windows ($nTrueHits true)")
  }

  test("unigram surprise matches the hand-computed distribution") {
    // vocab {a: 3, b: 3}, total 6 → every token has p = 0.5,
    // surprise = ln 2 → avg rounds to 0.6931 for both docs
    val d = docs(1L -> "a a b", 2L -> "a b b")
    val out = CorpusDedup.unigramSurpriseStats(d)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((1L, 3L, 0.6931), (2L, 3L, 0.6931)))
  }
}
