package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-level exact-substructure dedup and decontamination — the
  * remaining first-class LLM-training-data operators (builder brief):
  *
  *  - segment-level corpus dedup (the C4 recipe: drop every repeated
  *    fixed-size span corpus-wide, keeping only its first occurrence);
  *  - duplicated-substring span detection (the Lee et al. 2021
  *    "Deduplicating Training Data Makes Language Models Better"
  *    ExactSubstr shape: find maximal token ranges shared verbatim across
  *    documents);
  *  - benchmark decontamination (flag training documents sharing any
  *    n-gram with a held-out eval slice — the PaLM/GPT-3 appendix check);
  *  - unigram-LM surprise scoring (the CCNet-style proxy for perplexity
  *    filtering: score each document against the corpus's own unigram
  *    distribution).
  *
  * None of these exist in the reference (its only text artifact is the
  * event_type enum — SURVEY.md §2.8); they extend the dedup family in
  * [[Dedup]] from whole-document identity to sub-document structure.
  *
  * All four are pure DataFrame plans: explode/sequence/slice expressions
  * stay inside WholeStageCodegen, every shuffle is keyed on either a
  * content hash (uniform by construction — no skew) or doc_id, and the
  * only broadcast is a provably small side (the eval n-gram set / the
  * 1-row corpus total). Everything is oracle-checked — md5 over the
  * joined token window matches DuckDB's md5 exactly.
  */
object CorpusDedup {

  /** Token k-gram width shared by span detection and decontamination.
    * 8 consecutive tokens is selective on this corpus (only the planted
    * near-duplicate families collide) while short enough that every
    * document (min 10 tokens) contributes windows. */
  private[operators] val GramK = 8

  /** Segment width for C4-style dedup: non-overlapping 10-token spans. */
  private[graft] val SegLen = 10

  /** Every-50th document is the held-out "benchmark" slice for
    * decontamination — deterministic, so both engines agree. */
  private[operators] val EvalMod = 50

  /** (doc_id, pos, h): one row per overlapping k-token window, h = md5 of
    * the space-joined window text, pos = 0-based start token index.
    * Narrow explode, no shuffle; output is ~n_tokens rows per doc. */
  private[operators] def tokenWindows(docs: DataFrame, k: Int = GramK): DataFrame =
    // widened: one md5 per overlapping k-token window — the substring
    // family's dominant per-row cost (guide §2.5); downstream is
    // hash-keyed elections and counts, all exact
    graft.Tables.widened(docs)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(toks) - $k),
           |          i -> named_struct(
           |            'pos', i,
           |            'h', md5(cast(array_join(slice(toks, i + 1, $k), ' ') as binary))))"""
          .stripMargin)).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.h").as("h"))

  /** DuckDB twin of [[tokenWindows]] as a CTE body (w: doc_id, pos, h). */
  private def windowsCte(k: Int = GramK): String =
    s"""w AS (
       |  SELECT doc_id, pos, md5(array_to_string(toks[pos + 1 : pos + $k], ' ')) AS h
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
       |        WHERE len(string_split(text, ' ')) >= $k) t,
       |       LATERAL (SELECT unnest(generate_series(0, len(toks) - $k)) AS pos) p)"""
      .stripMargin

  // ---------------------------------------------------------------------
  // C4-style segment dedup
  // ---------------------------------------------------------------------

  /** C4-style corpus dedup over non-overlapping [[SegLen]]-token segments:
    * each segment is kept iff it is the corpus-wide FIRST occurrence of
    * its exact text (first = smallest (doc_id, seg_idx)); per document,
    * report how much survives.
    *
    * Scale shape — this is the canonical 100 TB dedup plan: one explode
    * into (doc_id, seg_idx, seg_md5) rows, ONE shuffle keyed on the
    * content hash (uniform; a hot segment costs one window partition, not
    * a hot node), a per-hash `row_number` window to elect the first
    * occurrence, then a doc_id re-aggregation. No joins, no driver state,
    * nothing proportional to corpus size on any single node. */
  /** Explode each document into its non-overlapping `segLen`-token
    * segments, appending (seg_idx, seg_md5) and KEEPING every other input
    * column — shared by the batch dedup below and the streaming
    * first-occurrence dedup (streaming/CorpusStream). Narrow, no shuffle;
    * works identically on a streaming DataFrame. */
  def withSegments(docs: DataFrame, segLen: Int = SegLen): DataFrame =
    // widened (identity on a streaming frame): per-segment md5 off a
    // one-row-group batch scan is single-task otherwise (guide §2.5)
    graft.Tables.widened(docs)
      .withColumn("toks", split(col("text"), " "))
      .withColumn("sg", explode(expr(
        s"""transform(sequence(0, cast(ceil(size(toks) / $segLen.0) as int) - 1),
           |          si -> named_struct(
           |            'seg_idx', si,
           |            'seg_md5', md5(cast(array_join(slice(toks, si * $segLen + 1, $segLen), ' ') as binary))))"""
          .stripMargin)))
      .withColumn("seg_idx", col("sg.seg_idx"))
      .withColumn("seg_md5", col("sg.seg_md5"))
      .drop("toks", "sg")

  def segmentDedupStats(docs: DataFrame, segLen: Int = SegLen): DataFrame = {
    val segs = withSegments(docs.select(col("doc_id"), col("text")), segLen)
      .select(col("doc_id"), col("seg_idx"), col("seg_md5"))
    val firstWin = Window.partitionBy(col("seg_md5"))
      .orderBy(col("doc_id"), col("seg_idx"))
    segs
      .withColumn("rn", row_number().over(firstWin))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        round(sum(when(col("rn") === 1, 1.0).otherwise(0.0)) / count(lit(1)), 4)
          .as("kept_frac"))
      .orderBy(col("doc_id"))
  }

  def segmentDedup(s: SparkSession, d: String): DataFrame =
    segmentDedupStats(Tables.documents(s, d))

  val segmentDedupOracle: String =
    s"""WITH segs AS (
       |  SELECT doc_id, si AS seg_idx,
       |         md5(array_to_string(toks[si * $SegLen + 1 : si * $SegLen + $SegLen], ' ')) AS seg_md5
       |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
       |       LATERAL (SELECT unnest(generate_series(0,
       |                  CAST(ceil(len(toks) / $SegLen.0) AS INT) - 1)) AS si) p),
       |ranked AS (
       |  SELECT doc_id,
       |         row_number() OVER (PARTITION BY seg_md5 ORDER BY doc_id, seg_idx) AS rn
       |  FROM segs)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_segments,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(round(CAST(sum(CASE WHEN rn = 1 THEN 1.0 ELSE 0.0 END) / count(*)
       |       AS DECIMAL(18,8)), 4) AS DOUBLE) AS kept_frac
       |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Duplicated-substring spans (ExactSubstr)
  // ---------------------------------------------------------------------

  /** Maximal duplicated-substring spans: every token range whose
    * [[GramK]]-gram windows ALL occur verbatim in at least one other
    * document, merged to maximal runs (the gaps-and-islands step). Output
    * one row per (doc, span): start/end token index and window count.
    *
    * Scale shape: window rows → hash-keyed aggregation electing hashes
    * with ≥2 distinct documents (two-phase, map-side combined) → LEFT SEMI
    * join of windows against that duplicated-hash relation (equi-join on
    * the hash; AQE picks broadcast when the dup set is small, shuffle-hash
    * when it is not) → per-doc sort to merge adjacent positions. The
    * quadratic all-pairs comparison of naive substring dedup never
    * appears; cost is linear in corpus windows plus the dup-set join. */
  def substringSpanStats(docs: DataFrame, k: Int = GramK): DataFrame = {
    val w = tokenWindows(docs, k)
    val dup = w.groupBy(col("h"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"))
    val islands = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    w.join(dup, Seq("h"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(islands))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
      .orderBy(col("doc_id"), col("span_start"))
  }

  def substringSpans(s: SparkSession, d: String): DataFrame =
    substringSpanStats(Tables.documents(s, d))

  val substringSpansOracle: String =
    s"""WITH ${windowsCte()},
       |dup AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
       |d AS (SELECT w.doc_id, w.pos FROM w JOIN dup USING (h)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |        FROM d)
       |SELECT doc_id,
       |  CAST(min(pos) AS INT) AS span_start,
       |  CAST(max(pos) + ${GramK - 1} AS INT) AS span_end,
       |  CAST(count(*) AS BIGINT) AS n_windows
       |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin

  // ---------------------------------------------------------------------
  // Benchmark decontamination
  // ---------------------------------------------------------------------

  /** Benchmark decontamination: documents `doc_id % EvalMod = 0` form the
    * held-out eval slice; every other (training) document is flagged with
    * the number of its [[GramK]]-gram windows that appear verbatim
    * anywhere in the eval slice. Only contaminated documents are emitted.
    *
    * Scale shape: the eval n-gram set is smaller than the corpus by
    * construction (a benchmark is KBs–MBs against a 100 TB corpus), so it
    * is distinct-ed and explicitly `broadcast` — the training-side scan
    * never shuffles; contamination detection is a map-side hash probe
    * inside codegen, then one doc_id aggregation of the few hits. The
    * same plan with the broadcast replaced by a bloom filter trades exact
    * hit counts for a fixed-size probe when the benchmark suite is huge. */
  def decontaminateStats(docs: DataFrame, k: Int = GramK, evalMod: Int = EvalMod): DataFrame = {
    val w = tokenWindows(docs, k)
    val evalGrams = w.filter(col("doc_id") % evalMod === 0)
      .select(col("h")).distinct()
    w.filter(col("doc_id") % evalMod =!= 0)
      .join(broadcast(evalGrams), Seq("h"), "inner")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  def decontaminate(s: SparkSession, d: String): DataFrame =
    decontaminateStats(Tables.documents(s, d))

  val decontaminateOracle: String =
    s"""WITH ${windowsCte()},
       |eg AS (SELECT DISTINCT h FROM w WHERE doc_id % $EvalMod = 0)
       |SELECT w.doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |FROM w JOIN eg USING (h)
       |WHERE w.doc_id % $EvalMod <> 0
       |GROUP BY w.doc_id ORDER BY w.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Unigram-LM surprise (perplexity-proxy quality score)
  // ---------------------------------------------------------------------

  /** CCNet-style LM-proxy scoring: build the corpus's own unigram
    * distribution, then score each document by its mean token surprise
    * −ln p(token). High-surprise documents are off-distribution (noise,
    * wrong language); low-surprise ones are repetitive boilerplate — both
    * tails are what perplexity filtering drops before LLM training.
    *
    * Scale shape: the unigram table is one two-phase count aggregation
    * (vocab-sized, not corpus-sized); the corpus total is a single global
    * count — one Long on the driver regardless of corpus size (the same
    * bounded-driver-scalar pattern as RankStats' offsets; a constant-key
    * broadcast join would constant-fold into a nested-loop join, and a
    * `sum over ()` window would plan an Exchange SinglePartition over the
    * vocab). Scoring joins tokens to the vocab on the token key — AQE
    * broadcasts it while it fits, falls back to a hash-keyed shuffle join
    * for open-web-scale vocabularies. The final doc_id aggregation is the
    * only corpus-wide shuffle. */
  def unigramSurpriseStats(docs: DataFrame): DataFrame =
    unigramSurpriseOfTok(
      docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tk")))

  /** The scoring core over a prepared token stream — `tok` is referenced
    * three times (sizing count + the plan's vocab and scoring branches;
    * Spark does not CSE across self-joins), so the registered query
    * persists it for the build and releases it after the artifact write,
    * while spec fixtures pass a plain small frame. */
  private def unigramSurpriseOfTok(tok: DataFrame): DataFrame = {
    val vocab = tok.groupBy(col("tk")).agg(count(lit(1)).as("c"))
    val total = tok.count()
    val withP = vocab
      .select(col("tk"), (col("c").cast("double") / lit(total).cast("double")).as("p"))
    // The per-token surprise is quantized to DECIMAL(28,8) and summed in
    // exact decimal arithmetic before the (identical-on-both-sides) double
    // division — a plain double avg() is summation-order-dependent and
    // flipped a 4-dp round boundary between engines at sf0.1.
    tok.join(withP, Seq("tk"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum((-log(col("p"))).cast("decimal(28,8)")).cast("double")
          / count(lit(1)), 4).as("avg_surprise"))
      .orderBy(col("doc_id"))
  }

  def unigramSurprise(s: SparkSession, d: String): DataFrame = {
    SessionCaches.parquetArtifact(s, s"corpus-unigram-surprise:$d") { dir =>
      val tok = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tk"))
        .persist()
      unigramSurpriseOfTok(tok).write.mode("overwrite").parquet(dir)
      tok.unpersist(blocking = false)
    }.orderBy(col("doc_id"))
  }

  val unigramSurpriseOracle: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tk FROM documents),
      |v AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk),
      |t AS (SELECT sum(c) AS total FROM v)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_tokens,
      |  -- single round of the (bit-identical) double quotient: an
      |  -- intermediate DECIMAL(18,8) cast here would DOUBLE-ROUND
      |  -- (…49997 → …5000 → up) and diverge from Spark's round(x, 4)
      |  CAST(round(CAST(sum(CAST(-ln(c * 1.0 / total) AS DECIMAL(28,8))) AS DOUBLE)
      |       / count(*), 4) AS DOUBLE) AS avg_surprise
      |FROM tok JOIN v USING (tk) CROSS JOIN t
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram-LM surprise — the context-aware step up from
    * [[unigramSurpriseStats]] (the CCNet/KenLM stage trains an n-gram LM;
    * a self-trained add-α bigram model is its distributed, oracle-checkable
    * analog): P(w2|w1) = (C(w1,w2) + α) / (C(w1·) + α·V) with α = 0.5 and
    * V = corpus vocabulary size, scored as each document's mean −ln P over
    * its bigrams. Unigram surprise flags off-vocabulary noise; the bigram
    * model additionally flags scrambled word ORDER (every token common,
    * every transition rare) — shuffled/templated text that unigram scoring
    * cannot see. Docs with <2 tokens have no transitions and are absent
    * (same rule as `text_repetition_stats`).
    *
    * Scale shape: the model is two vocab-sized count aggregations (bigram
    * + context), V is one bounded driver scalar (the RankStats idiom);
    * scoring joins the bigram stream to both tables on their gram keys —
    * AQE broadcasts while they fit, hash-shuffle beyond — and the per-doc
    * rollup is the one corpus-wide shuffle. Surprise sums use the
    * DECIMAL(28,8) quantize-then-sum idiom ([[unigramSurpriseStats]]) so
    * cross-engine summation order cannot flip the 4-dp round. */
  def bigramSurpriseStats(docs: DataFrame): DataFrame =
    bigramSurpriseOfBg(bigramsOf(docs), docs)

  private def bigramsOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), split(col("text"), " ").as("t"))
    .filter(size(col("t")) >= 2)
    .select(col("doc_id"), explode(expr(
      "transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))")).as("b"))
    .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Scoring core over a prepared bigram stream — `bg` feeds the model's
    * two count tables AND the scoring stream (three plan references; see
    * [[unigramSurpriseOfTok]]); `docs` is only read once more for the
    * vocabulary scalar (V must count single-token docs' words too, which
    * the bigram stream cannot see). */
  private def bigramSurpriseOfBg(bg: DataFrame, docs: DataFrame): DataFrame = {
    val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
    val ctx = bg.groupBy(col("w1")).agg(count(lit(1)).as("cw"))
    val halfV = 0.5 * docs
      .select(explode(split(col("text"), " ")).as("tk"))
      .agg(countDistinct(col("tk"))).head.getLong(0)
    bg.join(big, Seq("w1", "w2")).join(ctx, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(sum((-log((col("c") + lit(0.5)) / (col("cw") + lit(halfV))))
            .cast("decimal(28,8)")).cast("double") / count(lit(1)), 4)
          .as("avg_nll"))
      .orderBy(col("doc_id"))
  }

  def bigramSurprise(s: SparkSession, d: String): DataFrame =
    SessionCaches.parquetArtifact(s, s"corpus-bigram-surprise:$d") { dir =>
      val docs = Tables.documents(s, d)
      val bg = bigramsOf(docs).persist()
      bigramSurpriseOfBg(bg, docs).write.mode("overwrite").parquet(dir)
      bg.unpersist(blocking = false)
    }.orderBy(col("doc_id"))

  val bigramSurpriseOracle: String =
    """WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |       FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
      |             FROM tok WHERE len(t) >= 2)),
      |big AS (SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2),
      |ctx AS (SELECT w1, count(*) AS cw FROM bg GROUP BY w1),
      |v AS (SELECT count(DISTINCT tk) AS vs FROM
      |        (SELECT unnest(string_split(text, ' ')) AS tk FROM documents))
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(round(CAST(sum(CAST(-ln((c + 0.5) / (cw + 0.5 * vs)) AS DECIMAL(28,8)))
      |         AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_nll
      |FROM bg JOIN big USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // Bloom-prefiltered decontamination
  // ---------------------------------------------------------------------

  /** Per-task lazy bloom probe: each task deserializes the broadcast
    * filter ONCE (readFrom on a ~1 MB bitset), then probes rows against
    * the decoded bitset — the same broadcast-sketch shape as
    * [[graft.functions.CountMinAggregator.BroadcastEstimator]]. */
  final class BloomProbe(
      bc: org.apache.spark.broadcast.Broadcast[Array[Byte]]) extends Serializable {
    @transient private lazy val bf =
      org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bc.value))
    def apply(h: String): Boolean = bf.mightContainString(h)
  }

  /** [[decontaminateStats]] with a bloom-filter prefilter — the variant
    * for when the benchmark suite is too large to broadcast as a hash
    * relation but fits as a fixed-size bitset. Three stages:
    *
    *  1. build a bloom over the eval slice's distinct gram hashes with
    *     `stat.bloomFilter` — a DISTRIBUTED aggregate whose partials are
    *     fixed-size bitsets OR-merged on the driver; the driver holds only
    *     the final ~1 MB filter, never the gram set;
    *  2. probe every training-side window against the broadcast bitset
    *     (narrow map, no shuffle) — at 1% fpp this discards ~99% of the
    *     clean corpus BEFORE any exchange, so the join input shrinks from
    *     |corpus windows| to |true hits| + 1% noise;
    *  3. an exact inner join of the few survivors against the eval gram
    *     relation removes the false positives, making the output
    *     BYTE-IDENTICAL to the exact [[decontaminateStats]] plan — which
    *     is why this query shares its DuckDB oracle.
    *
    * At 100 TB stage 2 is the whole story: the exact plan must broadcast
    * (or worse, shuffle) every training window into a join; this plan
    * exchanges only the candidate set, orders of magnitude smaller.
    * CorpusDedupSpec pins output equality with the exact plan and the
    * candidate-reduction factor. */
  def decontaminateBloomStats(
      docs: DataFrame, k: Int = GramK, evalMod: Int = EvalMod): DataFrame = {
    val spark = docs.sparkSession
    val w = tokenWindows(docs, k)
    // persisted through the two driver-side passes (sizing count +
    // bloom build) so the eval-side tokenize+explode runs once for them
    val evalGrams = w.filter(col("doc_id") % evalMod === 0)
      .select(col("h")).distinct().persist()
    // capacity from the ACTUAL gram count, never a constant: a filter
    // sized for a fixed 200k saturates on a larger benchmark suite (the
    // exact regime this variant exists for) and its false-positive rate
    // collapses stage 2 into a worse-than-exact plan
    val nGrams = math.max(1L, evalGrams.count())
    val bloom = evalGrams.stat.bloomFilter("h", nGrams, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val probe = new BloomProbe(spark.sparkContext.broadcast(bytes))
    val mightContain = udf((h: String) => probe(h))
    // the two driver-side passes (count, bloom) are done — release the
    // cache now rather than pin it for the session; the stage-3 join
    // recomputes the eval slice once at execution (1/evalMod of the
    // corpus, a narrow explode), which beats an unbounded driver collect
    // or a session-lifetime cache
    evalGrams.unpersist(blocking = false)
    w.filter(col("doc_id") % evalMod =!= 0)
      .filter(mightContain(col("h")))
      .join(broadcast(evalGrams), Seq("h"), "inner")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  def decontaminateBloom(s: SparkSession, d: String): DataFrame =
    decontaminateBloomStats(Tables.documents(s, d))

  /** Incremental ExactSubstr (round-7 verdict "Next round" #7): maximal
    * spans of a NEW batch (doc_id % 10 = 7, the
    * [[graft.operators.Dedup.incrementalDedup]] convention) whose
    * [[GramK]]-gram windows all occur verbatim somewhere in the STANDING
    * corpus. The corpus side is only its distinct window-hash index — in
    * production a materialized relation the ingest job maintains (the
    * postings-index pattern), never corpus text — the batch side is
    * windowed and LEFT SEMI joined on the hash, and the gaps-and-islands
    * merge runs within batch documents only. Corpus cost is index lookup,
    * not rescan: the batch-vs-corpus shape applied at substring
    * granularity. */
  def incrementalSubstringSpans(s: SparkSession, d: String, k: Int = GramK): DataFrame = {
    val docs = Tables.documents(s, d)
    val corpusIdx = tokenWindows(docs.filter(col("doc_id") % 10 =!= 7), k)
      .select(col("h")).distinct()
    val w = tokenWindows(docs.filter(col("doc_id") % 10 === 7), k)
    val islands = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    w.join(corpusIdx, Seq("h"), "left_semi")
      .withColumn("grp", col("pos") - row_number().over(islands))
      .groupBy(col("doc_id"), col("grp"))
      .agg(
        min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(k - 1)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .drop("grp")
      .orderBy(col("doc_id"), col("span_start"))
  }

  val incrementalSubstringSpansOracle: String =
    s"""WITH ${windowsCte()},
       |corpus AS (SELECT DISTINCT h FROM w WHERE doc_id % 10 <> 7),
       |b AS (SELECT w.doc_id, w.pos FROM w
       |      WHERE doc_id % 10 = 7 AND h IN (SELECT h FROM corpus)),
       |isl AS (SELECT doc_id, pos,
       |               pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
       |        FROM b)
       |SELECT doc_id,
       |  CAST(min(pos) AS INT) AS span_start,
       |  CAST(max(pos) + ${GramK - 1} AS INT) AS span_end,
       |  CAST(count(*) AS BIGINT) AS n_windows
       |FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("text_segment_dedup", Some(segmentDedupOracle), segmentDedup),
    Q("dedup_substring_spans", Some(substringSpansOracle), substringSpans),
    Q("dedup_substring_incremental", Some(incrementalSubstringSpansOracle),
      (s, d) => incrementalSubstringSpans(s, d)),
    Q("text_decontaminate", Some(decontaminateOracle), decontaminate),
    Q("text_decontaminate_bloom", Some(decontaminateOracle), decontaminateBloom),
    Q("text_unigram_surprise", Some(unigramSurpriseOracle), unigramSurprise),
    Q("text_bigram_surprise", Some(bigramSurpriseOracle), bigramSurprise))
}
