package graft.operators

import java.security.MessageDigest

import graft.SparkSuite

/** Ground-truth checks for the deterministic sampling family — the
  * oracle gate proves Spark≡DuckDB; these prove the selection semantics
  * (leakage containment, temperature rates, cap pre-shuffle pruning). */
class SamplingSpec extends SparkSuite {

  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("weighted sample matches an independent in-memory Efraimidis–Spirakis draw") {
    val docs = graft.Tables.documents(spark, Sf)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    // same u and key formulas, computed with JDK arithmetic
    val keyed = docs.map { case (id, w) =>
      val h = java.lang.Long.parseLong(md5hex(id.toString).take(12), 16)
      val u = (h.toDouble + 1.0) / 281474976710657.0
      (id, math.log(u) / w.toDouble)
    }
    val wantTop = keyed.sortBy { case (id, k) => (-k, id) }.take(100).map(_._1).toSet
    val got = Sampling.weightedSample(spark, Sf).select($"doc_id").as[Long].collect()
    assert(got.length === 100)
    assert(got.toSet === wantTop)
    // weighting sanity: the selected docs skew long — mean n_chars of the
    // sample must exceed the corpus mean (weight ∝ n_chars)
    val byId = docs.toMap
    val meanAll = docs.map(_._2).sum.toDouble / docs.length
    val meanSel = got.map(byId).sum.toDouble / got.length
    assert(meanSel > meanAll, s"sample mean $meanSel not above corpus mean $meanAll")
  }

  test("leakage-free split puts exact-duplicate texts in the same split") {
    val docs = (1L to 400L).map { i =>
      // 100 texts, each duplicated 4× under different doc ids
      (i, s"shared text number ${i % 100}")
    }.toDF("doc_id", "text")
    val out = Sampling.leakageFreeSplitOf(docs)
      .select("fp", "split").distinct()
      .groupBy("fp").count().filter($"count" > 1).count()
    assert(out === 0, "a duplicate family was split across train/test")
    // and both splits are actually populated on this corpus
    val splits = Sampling.leakageFreeSplitOf(docs)
      .select("split").distinct().as[String].collect().toSet
    assert(splits === Set("train", "test"))
  }

  test("temperature mixture keeps all of the rarest language, downsamples the dominant") {
    val docs = ((1L to 90L).map(i => (i, "x", "en")) ++
      (91L to 100L).map(i => (i, "x", "fr")))
      .toDF("doc_id", "text", "lang")
    val kept = Sampling.mixtureSampleOf(docs)
      .as[(Long, String)].collect().toSeq
    // fr is the rarest: w_fr = (0.1)^-0.5 is the max weight → thr 256 → all kept
    assert(kept.count(_._2 == "fr") === 10)
    // en threshold: floor((0.9^-0.5 / 0.1^-0.5) * 256) = floor(85.33) = 85 = 0x55
    val expectedEn = (1L to 90L).filter(i => md5hex(i.toString).take(2) < "55")
    assert(kept.filter(_._2 == "en").map(_._1) === expectedEn)
  }

  test("source cap keeps at most `cap` docs per source via WindowGroupLimit") {
    val capped = Sampling.sourceCap(spark, Sf, cap = 3)
    val counts = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(counts.nonEmpty && counts.forall(_._2 <= 3))
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      plan.linesIterator.take(10).mkString("\n"))
  }

  test("token-budget mix fully keeps the lightest source and downsamples the heaviest") {
    val docs = graft.Tables.documents(spark, Sf)
    val tok = docs.selectExpr("doc_id", "source", "size(split(text, ' ')) AS n_tok")
    val mass = tok.groupBy("source").sum("n_tok")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val lightest = mass.minBy(_._2)._1
    val heaviest = mass.maxBy(_._2)._1
    val kept = Sampling.tokenBudgetMix(spark, Sf)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = tok.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept(lightest) == counts(lightest),
      s"binding source $lightest must keep all ${counts(lightest)} docs")
    assert(kept.getOrElse(heaviest, 0L) < counts(heaviest),
      s"heaviest source $heaviest must be downsampled")
    // the draw is a per-doc md5 threshold: kept set is a subset, never a reorder
    assert(kept.values.sum <= counts.values.sum)
  }

  test("epoch mix replicates the rare language to the cap and fractionally downsamples the dominant") {
    // lang X: 1 doc, lang Y: 9 docs, total 10, K=2:
    // e_X = 10/(1·2) = 5 → capped at 4 full replicas, no fractional draw;
    // e_Y = 10/(9·2) = 0.5556 → 0 full + draw at floor(0.5556·256) = 142 = 0x8e
    val docs = (Seq((1L, "x", "X")) ++ (11L to 19L).map(i => (i, "x", "Y")))
      .toDF("doc_id", "text", "lang")
    val out = Sampling.epochMixOf(docs)
      .as[(Long, String, Long)].collect().toSeq
    assert(out.filter(_._2 == "X") ==
      (1L to 4L).map(r => (1L, "X", r)), out.filter(_._2 == "X").toString)
    val expectY = (11L to 19L).filter(i => md5hex(s"$i#1").take(2) < "8e")
    assert(out.filter(_._2 == "Y").map(_._1) == expectY,
      out.filter(_._2 == "Y").toString)
    assert(out.filter(_._2 == "Y").forall(_._3 == 1L))
  }

  test("dsir selection reproduces a first-principles log importance ratio ranking") {
    // target source "t" is alpha-heavy; raw corpus is dominated by beta/gamma.
    // Expected: doc 1 (pure alpha) ranks first; doc 4 (longest pure-raw doc)
    // last — the total log-ratio accumulates per token, so the longest
    // out-of-target doc scores lowest, not the rarest-token one.
    val corpus = Seq(
      (1L, "alpha alpha alpha", "t"),
      (2L, "alpha beta alpha", "t"),
      (3L, "alpha beta beta", "o1"),
      (4L, "beta beta beta beta", "o1"),
      (5L, "gamma gamma", "o2"))
    val docs = corpus.toDF("doc_id", "text", "source")
    val out = Sampling.dsirSelectOf(docs, target = "t", k = 5)
      .as[(Long, Long, Double)].collect().toSeq
    // recompute the weights from the paper's formula, independently of Spark
    val toks = corpus.map { case (id, txt, src) =>
      (id, src, txt.split(" ").toSeq.map(tk => md5hex(tk).take(2)))
    }
    val all = toks.flatMap(_._3)
    val tgt = toks.filter(_._2 == "t").flatMap(_._3)
    def dw(b: String): BigDecimal = BigDecimal(
      math.log((tgt.count(_ == b) + 0.5) / (tgt.size + 128.0)) -
        math.log((all.count(_ == b) + 0.5) / (all.size + 128.0)))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    val expected = toks.map { case (id, _, bs) =>
      val lr = BigDecimal(bs.map(dw).sum.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, bs.size.toLong, lr)
    }.sortBy { case (id, _, lr) => (-lr, id) }
    assert(out === expected, s"got $out")
    assert(out.head._1 === 1L && out.last._1 === 4L)
  }
}
