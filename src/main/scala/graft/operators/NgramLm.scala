package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Bigram language-model perplexity filtering — the CCNet/KenLM stage of
  * the published web-corpus pipelines (Wenzek et al. 2020): train an
  * n-gram LM on the corpus, score every document's perplexity, keep the
  * low-perplexity (fluent) tail. Here the LM is an add-one-smoothed
  * bigram model trained on the corpus itself; in a production run the LM
  * trains on a trusted reference corpus and only the scoring half runs
  * over the 100 TB — the plan shape is identical.
  *
  * Numeric contract: `ln p` is quantized to a 1e-6 integer lattice ONCE
  * PER DISTINCT BIGRAM (the vocab²-bounded LM table), so the per-document
  * score is an exact integer sum of lattice values — order-independent
  * under any partitioning, and the cross-engine surface is the LM table
  * (~|V|² values through one `ln` each with floor(x·1e6+0.5)), not the
  * corpus-sized bigram stream. The reported `logppl_micro` is integer
  * division of exact integers (both engines truncate toward zero).
  *
  * Scale shape:
  *  - bigram extraction is a narrow explode (doc-local, no shuffle until
  *    the count aggregates);
  *  - the LM is TWO vocab-bounded aggregates (bigram counts + context
  *    counts) — map-side combinable; at web scale the standard top-V cap
  *    with an OOV bucket bounds it, exactly like [[Bpe.VocabCap]];
  *  - scoring joins the bigram stream against the BROADCAST LM (hinted
  *    explicitly) and aggregates per doc_id — the explode rows of a doc
  *    are co-located with it, so partial aggregation absorbs the fan-out
  *    before the one shuffle.
  */
object NgramLm {

  /** Keep threshold: logppl_micro < 3.4e6 ⇔ perplexity < e^3.4 ≈ 30. */
  val KeepBelowMicro = 3400000L

  /** Corpus bigram stream: (doc_id, w1, w2) with a per-doc `<s>` start
    * context — every token appears exactly once as w2, so n_bigrams =
    * n_tokens and vocab = distinct(w2). */
  private[operators] def bigramsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val toks = split($"text", " ")
    val prev = concat(array(lit("<s>")), slice(toks, lit(1), size(toks) - 1))
    // NOT widened: the zip-explode is cheap per row (no hashing), and a
    // measured A/B showed the extra repartition costs more than the
    // single-task scan here (0.68 s → 2.2 s with the widen) — the
    // family's real cost is the count/join aggregates downstream
    docs
      .select($"doc_id", explode(arrays_zip(prev.as("w1"), toks.as("w2"))).as("p"))
      .select($"doc_id", $"p.w1".as("w1"), $"p.w2".as("w2"))
  }

  /** Score a corpus against an LM given as its bigram-count table. The
    * whole model state derives from c2 alone: context counts are the
    * per-w1 sums (c1 ≡ Σ_w2 c2 by construction) and the vocab is the
    * distinct targets — which is what makes the LM incrementally
    * maintainable from ONE integer-count artifact. */
  private def scoreWith(docs: DataFrame, c2: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val c1 = c2.groupBy($"w1").agg(sum($"c2").as("c1"))
    val v = c2.select($"w2").distinct().count()
    val lm = c2.join(c1, "w1")
      .select($"w1", $"w2",
        floor(log(($"c2" + lit(1.0)) / ($"c1" + lit(v.toDouble))) * 1e6 + 0.5)
          .cast("long").as("lnp_micro"))
    bigramsOf(docs).join(broadcast(lm), Seq("w1", "w2"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum($"lnp_micro").as("sum_lnp_micro"))
      .withColumn("logppl_micro", expr("(-sum_lnp_micro) div n_bigrams"))
      .withColumn("kept", $"logppl_micro" < KeepBelowMicro)
      .orderBy($"doc_id")
  }

  /** Per-document perplexity under the corpus bigram LM. */
  def bigramPpl(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    scoreWith(docs,
      bigramsOf(docs).groupBy($"w1", $"w2").agg(count(lit(1)).as("c2")))
  }

  /** ∝-delta LM maintenance: the bigram-count table is a durable
    * artifact built from the base corpus slice; an append costs one
    * DELTA-sized bigram scan plus a vocab²-keyed integer merge — never a
    * corpus rescan. Integer counts merge exactly, and c1/vocab re-derive
    * from the merged table, so refresh ≡ full rebuild BIT-FOR-BIT — the
    * query is therefore gated against the FULL-corpus relearning oracle
    * (the [[Bpe.bpeTrainIncremental]] contract): any drift in the delta
    * algebra fails the hard gate. */
  def bigramPplIncremental(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val baseC2 = SessionCaches.parquetArtifact(s, s"lm-c2-base:$d") { dir =>
      bigramsOf(Tables.documents(s, d).filter($"doc_id" % 10 =!= 7))
        .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }
    val deltaC2 = bigramsOf(Tables.documents(s, d).filter($"doc_id" % 10 === 7))
      .groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
    val merged = baseC2.select($"w1", $"w2", $"c2")
      .unionByName(deltaC2)
      .groupBy($"w1", $"w2").agg(sum($"c2").as("c2"))
    scoreWith(Tables.documents(s, d), merged)
  }

  val bigramPplOracle: String =
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |big AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN i = 1 THEN '<s>' ELSE ts[i-1] END AS w1,
       |         ts[i] AS w2
       |  FROM toks, UNNEST(generate_series(1, len(ts))) AS u(i)),
       |c2 AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY 1),
       |vv AS (SELECT count(DISTINCT w2) AS v FROM big),
       |lm AS (
       |  SELECT w1, w2,
       |         CAST(floor(ln((c2 + 1.0) / (c1 + v)) * 1000000 + 0.5) AS BIGINT)
       |           AS lnp_micro
       |  FROM c2 JOIN c1 USING (w1) CROSS JOIN vv)
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_bigrams,
       |       CAST(sum(lnp_micro) AS BIGINT) AS sum_lnp_micro,
       |       (-CAST(sum(lnp_micro) AS BIGINT)) // CAST(count(*) AS BIGINT)
       |         AS logppl_micro,
       |       ((-CAST(sum(lnp_micro) AS BIGINT)) // CAST(count(*) AS BIGINT))
       |         < $KeepBelowMicro AS kept
       |FROM big JOIN lm USING (w1, w2)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  /** The trained LM in broadcast-model form, for serving outside the
    * batch join (the streaming admission path): bigram → lnp_micro,
    * context → back-off lnp for an UNSEEN continuation of a seen context
    * (ln(1/(c1+V)) on the same lattice), and the unseen-context default
    * ln(1/V). Vocab-bounded driver state — the same class of bounded
    * collect as k-means centroids or LR weights (at web scale the LM is
    * top-V-capped with an OOV bucket, like [[Bpe.VocabCap]]). */
  private[graft] def lmModel(s: SparkSession, d: String)
      : (Map[String, Long], Map[String, Long], Long) =
    SessionCaches.modelMemo(s, s"bigram-lm:$d") {
      import s.implicits._
      val big = bigramsOf(Tables.documents(s, d))
      val c2 = big.groupBy($"w1", $"w2").agg(count(lit(1)).as("c2"))
      val c1 = big.groupBy($"w1").agg(count(lit(1)).as("c1"))
      val v = big.select($"w2").distinct().count()
      def lat(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
      val lm = c2.join(c1, "w1")
        .select(concat_ws(" ", $"w1", $"w2").as("k"),
          floor(log(($"c2" + lit(1.0)) / ($"c1" + lit(v.toDouble))) * 1e6 + 0.5)
            .cast("long").as("lnp"))
        .as[(String, Long)].collect().toMap
      val backoff = c1
        .select($"w1", floor(log(lit(1.0) / ($"c1" + lit(v.toDouble))) * 1e6 + 0.5)
          .cast("long").as("lnp"))
        .as[(String, Long)].collect().toMap
      (lm, backoff, lat(math.log(1.0 / v)))
    }

  val defs: Seq[Q] = Seq(
    Q("text_bigram_ppl", Some(bigramPplOracle), bigramPpl),
    // refresh ≡ rebuild exactly, so the incremental path is gated against
    // the FULL-corpus relearning oracle
    Q("text_bigram_ppl_incremental", Some(bigramPplOracle), bigramPplIncremental))
}
