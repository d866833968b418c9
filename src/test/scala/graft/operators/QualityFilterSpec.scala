package graft.operators

import graft.SparkSuite

/** First-principles ground truth for the corpus quality-filter stages
  * added in round 8: the bigram-LM surprise scorer (hand-computed add-α
  * probabilities) and the per-source quantile filter (expected keep set
  * derived from an independent JVM MessageDigest reimplementation of the
  * hash-linear classifier). The sf-corpus runs are covered by the fully
  * independent DuckDB oracles (`text_bigram_surprise`,
  * `text_quality_quantile`). */
class QualityFilterSpec extends SparkSuite {
  import spark.implicits._

  test("source shrinkage: hand-computed James–Stein pull toward the corpus mean") {
    // srcA: 2 docs, ratios 1/2 ("the x") and 0/2 ("x y") → raw mean 0.25
    // srcB: 1 doc, ratio 1.0 ("the the") → raw mean 1.0 (tiny, extreme)
    // corpus mean = (0.5 + 0 + 1.0)/3 = 0.5
    // shrunk A = (2·0.25 + 20·0.5)/22 = 10.5/22 = 0.477272…
    // shrunk B = (1·1.0 + 20·0.5)/21 = 11/21 = 0.523809…
    // → B's extreme mean collapses near the prior; A moves less per doc
    val docs = Seq(
      (1L, "the x", "srcA"), (2L, "x y", "srcA"), (3L, "the the", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.sourceQualityShrunkOf(docs)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out("srcA") === ((2L, 0.25, 0.4773)))
    assert(out("srcB") === ((1L, 1.0, 0.5238)))
    // shrinkage direction: both pulled toward 0.5, neither across it
    assert(out("srcA")._3 > 0.25 && out("srcA")._3 < 0.5)
    assert(out("srcB")._3 < 1.0 && out("srcB")._3 > 0.5)
  }

  test("z-norm: hand-computed per-language standardization, zero-variance guard") {
    // lang en: ratios 0.5 ("the x") and 0.0 ("x y") → mean 0.25,
    //   population σ = 0.25 → z = +1, −1
    // lang fr: single doc → σ = 0 → z = 0 by the guard
    val docs = Seq(
      (1L, "the x", "en"), (2L, "x y", "en"), (3L, "le chat", "fr"))
      .toDF("doc_id", "text", "lang")
    val out = TextOps.qualityZNormOf(docs)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L) === 1.0)
    assert(out(2L) === -1.0)
    assert(out(3L) === 0.0)
  }

  test("bigram surprise: hand-computed add-0.5 probabilities on a 4-token vocab") {
    // corpus: "a b a b", "a c", "z" -> V=4, denominator add = 0.5*4 = 2.
    // C(a,b)=2, C(b,a)=1, C(a,c)=1; C(a·)=3, C(b·)=1.
    // P(b|a) = 2.5/5 = 0.5, P(a|b) = 1.5/3 = 0.5 -> doc 1 avg = ln 2;
    // P(c|a) = 1.5/5 = 0.3 -> doc 2 avg = ln(10/3). "z" has no bigrams.
    val out = CorpusDedup.bigramSurpriseStats(
        Seq(1L -> "a b a b", 2L -> "a c", 3L -> "z").toDF("doc_id", "text"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((3L, 0.6931)), out(1L).toString)
    assert(out(2L) == ((1L, 1.204)), out(2L).toString)
  }

  // The classifier's hash-linear weight, recomputed OUTSIDE Spark (java
  // MessageDigest + BigInteger vs Spark's md5/conv expressions).
  private def weightMilli(token: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % 1000 - 500
  }

  test("per-source quantile: drops exactly the bottom fifth by (logit, doc_id) per source") {
    // source A: 7 docs (drop floor(7/5)=1), source B: 4 docs (drop 0);
    // single-token texts so each logit is one independently-computed weight
    val words = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo")
    val docs = words.zipWithIndex.map { case (t, i) =>
      (i.toLong, if (i < 7) "A" else "B", t)
    }
    val out = TextOps.qualityQuantileOf(docs.toDF("doc_id", "source", "text"))
      .as[(Long, String, Long, Long, Int)].collect()
    assert(out.length == 11)
    out.foreach { case (id, _, logit, _, _) =>
      assert(logit == weightMilli(words(id.toInt)), s"doc $id logit $logit")
    }
    val expectDropA = docs.take(7)
      .map(d => (weightMilli(d._3), d._1)).sorted.head._2
    out.foreach { case (id, src, _, rank, keep) =>
      val n = if (src == "A") 7 else 4
      assert((keep == 1) == (5 * rank > n), s"doc $id rank $rank keep $keep")
      assert((keep == 0) == (src == "A" && id == expectDropA), s"doc $id")
    }
    // ranks are a permutation of 1..n per source, ordered by (logit, doc_id)
    Seq("A", "B").foreach { src =>
      val rows = out.filter(_._2 == src).sortBy(r => (r._3, r._1))
      assert(rows.map(_._4).toSeq == (1L to rows.length).toSeq, s"source $src ranks")
    }
  }

  test("per-source quantile: score ties break on doc_id, ranks stay unique") {
    // identical text -> identical logit for all docs; doc_id is the tiebreak
    val docs = (0L until 10L).map(i => (i, "S", "same text here"))
    val out = TextOps.qualityQuantileOf(docs.toDF("doc_id", "source", "text"))
      .as[(Long, String, Long, Long, Int)].collect().sortBy(_._1)
    assert(out.map(_._4).toSeq == (1L to 10L).toSeq)
    assert(out.count(_._5 == 0) == 2) // floor(10/5) dropped: doc_ids 0 and 1
    assert(out.filter(_._5 == 0).map(_._1).toSet == Set(0L, 1L))
  }

  test("Mann-Whitney AUC matches hand arithmetic, including ties") {
    // perfect separation → AUC 1
    val perfect = Seq((1L, 3L, true), (2L, 2L, true), (3L, 1L, false), (4L, 0L, false))
      .toDF("doc_id", "logit_milli", "pos")
    assert(Classifier.qualityAucOf(perfect).head().getDouble(2) === 1.0)
    // tie across classes: pos logits {2, 1}, neg {1, 0} →
    // U = 2 (logit 2 beats both) + 1.5 (tie with neg 1, beats 0) = 3.5
    // AUC = 3.5 / 4 = 0.875
    val tied = Seq((1L, 2L, true), (2L, 1L, false), (3L, 1L, true), (4L, 0L, false))
      .toDF("doc_id", "logit_milli", "pos")
    assert(Classifier.qualityAucOf(tied).head().getDouble(2) === 0.875)
    // anti-predictor → AUC 0
    val inverted = Seq((1L, 0L, true), (2L, 1L, false))
      .toDF("doc_id", "logit_milli", "pos")
    assert(Classifier.qualityAucOf(inverted).head().getDouble(2) === 0.0)
    // calibration sanity on the real corpus: monotone-ish readout exists,
    // bins bounded, rates in [0,1]
    val bins = Classifier.qualityCalibration(spark, Sf).collect()
    assert(bins.length <= 12 && bins.nonEmpty)
    bins.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(1) >= r.getLong(2))
    }
  }

  test("PR curve matches hand arithmetic on a planted logit/label table") {
    // logits chosen to land in distinct 250-milli bins:
    //   bin 4 (1000): pos;  bin 2 (500): pos;  bin 1 (250): neg;
    //   bin 0 (0): pos;  bin -2 (-500): neg
    val lab = Seq(
      (1L, 1000L, true), (2L, 500L, true), (3L, 250L, false),
      (4L, 0L, true), (5L, -500L, false))
      .toDF("doc_id", "logit_milli", "pos")
    val rows = Classifier.prCurveOf(lab).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // thresholds ascending; at thr 1000: pred {1}, tp 1 → P 1, R 1/3
    // at thr 500: pred {1,2}, tp 2 → P 1, R 2/3
    // at thr 250: pred {1,2,3}, tp 2 → P 2/3, R 2/3
    // at thr 0:   pred {1,2,3,4}, tp 3 → P 3/4, R 1
    // at thr -500 (bottom): everything → P 3/5, R 1
    assert(rows.map(_._1).toSeq == Seq(-500L, 0L, 250L, 500L, 1000L))
    val byThr = rows.map(r => r._1 -> r).toMap
    assert(byThr(1000L) == ((1000L, 1L, 1L, 1.0, 0.3333, 0.5)))
    assert(byThr(500L) == ((500L, 2L, 2L, 1.0, 0.6667, 0.8)))
    assert(byThr(250L) == ((250L, 3L, 2L, 0.6667, 0.6667, 0.6667)))
    assert(byThr(0L) == ((0L, 4L, 3L, 0.75, 1.0, 0.8571)))
    assert(byThr(-500L) == ((-500L, 5L, 3L, 0.6, 1.0, 0.75)))
    // structural laws on the real corpus: recall monotone non-decreasing
    // as the threshold drops, counts cumulative, ratios in [0,1]
    val corpus = Classifier.qualityPrCurve(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(corpus.nonEmpty && corpus.length <= 33)
    val asc = corpus.sortBy(_._1)
    asc.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3, "counts must cumulate downward")
      assert(lo._4 >= hi._4, "recall must not decrease as threshold drops")
    }
  }
}
