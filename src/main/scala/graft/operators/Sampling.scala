package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic corpus sampling — the selection ops a training-data
  * pipeline runs before anything expensive. All of them key on a hex
  * prefix of `md5(doc_id)` instead of `rand()`: a hash threshold is
  *
  *  - reproducible across runs, partitionings, and executor counts
  *    (`rand(seed)` seeds per-partition, so the sample silently changes
  *    whenever the scan splits differently — a real pipeline cannot
  *    version its training set on that);
  *  - a narrow per-row filter pushed to the scan — no shuffle, no
  *    global pass, identical cost at 100 TB;
  *  - portable SQL (md5 hex is engine-independent), so unlike `rand`
  *    sampling these are ORACLE-CHECKED, not rows-only.
  *
  * The hex-prefix comparison is a uniform [0,1) draw in disguise: the
  * first two hex chars are uniform over 256 values, so `< "28"` keeps
  * 40/256 ≈ 15.6%.
  */
object Sampling {

  private def hexPrefix(n: Int) =
    substring(md5(col("doc_id").cast("string")), 1, n)

  /** Stratified sample: per-language keep fractions (English kept at
    * 40/256, the rest at 20/256 — the downsample-the-dominant-language
    * shape every multilingual corpus build runs). */
  def stratifiedSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(hexPrefix(2) <
        when($"lang" === "en", lit("28")).otherwise(lit("14")))
      .select($"doc_id", $"lang", $"source")
      .orderBy($"doc_id")
  }

  val stratifiedSampleOracle: String =
    """SELECT doc_id, lang, source FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |      (CASE WHEN lang = 'en' THEN '28' ELSE '14' END)
      |ORDER BY doc_id""".stripMargin

  /** Deterministic train/test split: first hex char < 'c' → train
    * (12/16 = 75%). Reported as per-(split, lang) counts — the shape a
    * split audit reads; the assignment itself is the same narrow
    * expression applied to any downstream query. */
  def trainTestSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("split",
        when(hexPrefix(1) < "c", lit("train")).otherwise(lit("test")))
      .groupBy($"split", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"split", $"lang")
  }

  val trainTestSplitOracle: String =
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
      |            THEN 'train' ELSE 'test' END AS split,
      |       lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars
      |FROM documents GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** Temperature-based mixture resampling (α = 0.5): the
    * training-mixture reweighting step (multilingual/multi-domain corpus
    * builds resample source s with probability ∝ p_s^α so dominant
    * sources shrink and rare ones survive; keyed on `lang` here — the one
    * skewed dimension of this corpus, and the canonical multilingual
    * case). Keep-rate per language is
    * r_s = p_s^(α−1) / max_t p_t^(α−1) — the rarest language keeps
    * everything — applied as a deterministic md5 hex-prefix draw against
    * a per-source integer threshold (floor(r_s·256)), so the sample is
    * reproducible and oracle-checkable like everything else here.
    *
    * Scale shape: language rates come from one count aggregation
    * (key-cardinality-sized); the corpus total and the max weight are
    * single driver scalars (bounded at any corpus size — same pattern as
    * RankStats offsets); the rate table broadcasts (1M domains ≈ a few
    * MB) and the draw itself is a narrow per-row filter. */
  def mixtureSample(s: SparkSession, d: String, alpha: Double = 0.5): DataFrame =
    mixtureSampleOf(Tables.documents(s, d), alpha)

  def mixtureSampleOf(docs: DataFrame, alpha: Double = 0.5): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val total = docs.count().toDouble
    val weighted = docs.groupBy($"lang")
      .agg(count(lit(1)).cast("double").as("n"))
      .select($"lang", pow($"n" / total, alpha - 1).as("w"))
    val maxW = weighted.agg(max($"w")).first().getDouble(0)
    val th = weighted.select($"lang",
      floor($"w" / maxW * 256).cast("int").as("thr_int"))
    docs.join(broadcast(th), Seq("lang"))
      .filter($"thr_int" >= 256 ||
        hexPrefix(2) < lower(lpad(hex($"thr_int"), 2, "0")))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  val mixtureSampleOracle: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
      |t AS (SELECT sum(n) AS tot FROM c),
      |r AS (SELECT lang, pow(n / (SELECT tot FROM t), -0.5) AS w FROM c),
      |th AS (SELECT lang,
      |         CAST(floor(w / (SELECT max(w) FROM r) * 256) AS INT) AS thr_int
      |       FROM r)
      |SELECT d.doc_id, d.lang
      |FROM documents d JOIN th USING (lang)
      |WHERE thr_int >= 256
      |   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <
      |      lower(lpad(to_hex(thr_int), 2, '0'))
      |ORDER BY doc_id""".stripMargin

  /** Epoch-based mixture with UPSAMPLING — the one direction the other
    * sampling ops lack (they only ever drop rows): aim each language at
    * an equal share of the training mix by REPLICATING rare-language
    * documents e_s = total/(K·n_s) times, capped at 4 epochs (repeating
    * data beyond ~4 epochs stops buying loss — Muennighoff et al. 2023's
    * data-constrained scaling result), while dominant languages keep
    * e_s < 1 as a plain downsample draw. Fractional epochs are exact:
    * every doc emits ⌊e⌋ full replicas, plus one more with probability
    * e−⌊e⌋ decided by a deterministic md5 draw keyed on (doc_id, replica)
    * — so the emitted multiset is reproducible row-for-row and
    * oracle-checkable, like every draw in this file.
    *
    * Scale shape: per-language epochs come from one key-cardinality
    * aggregation broadcast back against the corpus; replication is a
    * narrow per-row `explode(sequence(...))` whose fan-out is bounded by
    * the epoch cap (≤5 rows per doc) — no shuffle anywhere; the output
    * stays partitioned like the scan. */
  def epochMix(s: SparkSession, d: String): DataFrame =
    epochMixOf(Tables.documents(s, d))

  def epochMixOf(docs: DataFrame, cap: Double = 4.0): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val counts = docs.groupBy($"lang").agg(count(lit(1)).as("n"))
    val k = counts.count()
    val total = docs.count()
    val ep = counts.select($"lang",
      least(lit(cap), lit(total).cast("double") / ($"n" * k)).as("e"))
    val th = ep.select($"lang",
      floor($"e").cast("long").as("full"),
      floor(($"e" - floor($"e")) * 256).cast("int").as("thr_int"))
    docs.join(broadcast(th), Seq("lang"))
      .select($"doc_id", $"lang", $"full", $"thr_int",
        explode(sequence(lit(1L), $"full" + lit(1L))).as("replica"))
      .filter($"replica" <= $"full" ||
        substring(md5(concat($"doc_id".cast("string"), lit("#"), $"replica".cast("string"))), 1, 2)
          < lower(lpad(hex($"thr_int"), 2, "0")))
      .select($"doc_id", $"lang", $"replica")
      .orderBy($"doc_id", $"replica")
  }

  // Note the replica filter lives INSIDE list_filter, before the unnest:
  // DuckDB's binder hits an internal error ("Failed to bind column
  // reference") when an outer WHERE references an unnest alias whose
  // range bound comes from a joined column.
  val epochMixOracle: String =
    """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS k FROM c),
      |ep AS (SELECT lang, least(4.0, total / CAST(n * k AS DOUBLE)) AS e
      |       FROM c CROSS JOIN t),
      |th AS (SELECT lang, CAST(floor(e) AS BIGINT) AS f,
      |              CAST(floor((e - floor(e)) * 256) AS INT) AS thr_int
      |       FROM ep),
      |r AS (SELECT d.doc_id, d.lang,
      |             unnest(list_filter(range(1, th.f + 2),
      |               rep -> rep <= th.f OR
      |                 substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
      |                            CAST(rep AS VARCHAR)), 1, 2) <
      |                 lower(lpad(to_hex(th.thr_int), 2, '0')))) AS replica
      |      FROM documents d JOIN th USING (lang))
      |SELECT doc_id, lang, CAST(replica AS BIGINT) AS replica
      |FROM r ORDER BY doc_id, replica""".stripMargin

  /** Leakage-free train/test split: the split draw keys on the CONTENT
    * fingerprint, not the doc id, so every member of an exact-duplicate
    * family lands in the same split — a doc-id draw leaks duplicated
    * text across the boundary and inflates eval scores. (Near-dup-family
    * splitting composes the same way with `Dedup.nearDupClusters`'
    * cluster_id as the key; that variant is spec-checked, not registered,
    * because LSH clusters have no SQL oracle.) Narrow per-row
    * expressions, no shuffle. */
  def leakageFreeSplit(s: SparkSession, d: String): DataFrame =
    leakageFreeSplitOf(Tables.documents(s, d))

  def leakageFreeSplitOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id", md5(lower($"text").cast("binary")).as("fp"))
      .withColumn("split",
        when(substring(md5($"fp".cast("binary")), 1, 1) < "c", lit("train"))
          .otherwise(lit("test")))
      .select($"doc_id", $"fp", $"split")
      .orderBy($"doc_id")
  }

  val leakageFreeSplitOracle: String =
    """SELECT doc_id, md5(lower(text)) AS fp,
      |       CASE WHEN substr(md5(md5(lower(text))), 1, 1) < 'c'
      |            THEN 'train' ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Per-source quota capping: keep at most `cap` docs per source,
    * elected by md5 order (a deterministic uniform draw — doc_id order
    * would bias toward whatever happened to be crawled first). The rank
    * filter compiles to Spark's WindowGroupLimit, which prunes to the
    * top-`cap` per source BEFORE the shuffle — each map task forwards at
    * most `cap` rows per source it sees, so a 100 TB scan shuffles
    * O(sources × cap × tasks) rows, not the corpus. */
  def sourceCap(s: SparkSession, d: String, cap: Int = 20): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"source")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
    Tables.documents(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= cap)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  val sourceCapOracle: String =
    """SELECT doc_id, source FROM documents
      |QUALIFY row_number() OVER (PARTITION BY source
      |          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 20
      |ORDER BY doc_id""".stripMargin

  /** Deterministic k-fold cross-validation assignment (k = 4): the fold
    * is read off the first two hex chars of md5(doc_id) against equal
    * [0x00, 0x40, 0x80, 0xc0) boundaries — a uniform draw, so folds are
    * balanced in expectation within every stratum without any shuffle
    * (the assignment is a narrow projection; reproducible across runs,
    * partitionings, and engines, unlike anything rand()-based). The
    * registered output is the per-(fold, lang) audit a split review
    * reads; the `fold` expression itself composes into any downstream
    * query as a pushed-down filter (`fold <> i` = train slice i). */
  def kfoldAssign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fold = when(hexPrefix(2) < "40", 0)
      .when(hexPrefix(2) < "80", 1)
      .when(hexPrefix(2) < "c0", 2)
      .otherwise(3)
    Tables.documents(s, d)
      .withColumn("fold", fold)
      .groupBy($"fold", $"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("n_chars"))
      .orderBy($"fold", $"lang")
  }

  val kfoldAssignOracle: String =
    """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40' THEN 0
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80' THEN 1
      |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'c0' THEN 2
      |            ELSE 3 END AS fold,
      |       lang,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars
      |FROM documents GROUP BY 1, 2 ORDER BY fold, lang""".stripMargin

  /** Deterministic global shuffle — the shuffle-before-pack step every
    * pretraining run needs: a reproducible pseudo-random permutation of
    * the corpus, here ORDER BY md5(salt ‖ doc_id). No global rank is
    * materialized (that would be a single-partition window): the sort IS
    * the operation — Catalyst plans a range shuffle + per-partition sort,
    * and the sorted write order is the permutation. Re-running with a new
    * salt reshuffles; same salt is bit-stable across partitionings. */
  def globalShuffle(s: SparkSession, d: String,
                    salt: String = "shuffle-v1"): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id",
        substring(md5(concat(lit(salt + ":"), $"doc_id".cast("string"))), 1, 16)
          .as("skey"))
      .orderBy($"skey", $"doc_id")
  }

  val globalShuffleOracle: String =
    """SELECT doc_id,
      |       substr(md5('shuffle-v1:' || CAST(doc_id AS VARCHAR)), 1, 16) AS skey
      |FROM documents ORDER BY skey, doc_id""".stripMargin

  /** Token-budget mixture: pretraining mixes are specified in TOKENS, not
    * documents (a few long docs can dominate a doc-balanced sample).
    * Here: equalize per-source token mass — every source is downsampled
    * to the token mass of the lightest source (rate_s = min_tokens /
    * tokens_s, quantized to the same 256-bucket md5 threshold as
    * [[mixtureSampleOf]]; the binding source keeps everything).
    *
    * Scale shape: one map-side-combinable token-mass aggregation (source-
    * cardinality-sized), one driver scalar (the min), a broadcast rate
    * table, and a narrow per-row draw — no shuffle of the corpus. */
  def tokenBudgetMix(s: SparkSession, d: String): DataFrame =
    tokenBudgetMixOf(Tables.documents(s, d))

  def tokenBudgetMixOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val tok = docs.select($"doc_id", $"source",
      size(split($"text", " ")).as("n_tok"))
    val mass = tok.groupBy($"source")
      .agg(sum($"n_tok").cast("long").as("tokens"))
    val minMass = mass.agg(min($"tokens")).head().getLong(0)
    val th = mass.select($"source",
      floor(lit(minMass.toDouble) / $"tokens".cast("double") * 256)
        .cast("int").as("thr_int"))
    tok.join(broadcast(th), Seq("source"))
      .filter($"thr_int" >= 256 ||
        hexPrefix(2) < lower(lpad(hex($"thr_int"), 2, "0")))
      .select($"doc_id", $"source", $"n_tok")
      .orderBy($"doc_id")
  }

  val tokenBudgetMixOracle: String =
    """WITH tok AS (SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS INT) AS n_tok
      |             FROM documents),
      |m AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS tokens FROM tok GROUP BY 1),
      |th AS (SELECT source,
      |         CAST(floor(CAST((SELECT min(tokens) FROM m) AS DOUBLE)
      |                    / CAST(tokens AS DOUBLE) * 256) AS INT) AS thr_int
      |       FROM m)
      |SELECT t.doc_id, t.source, t.n_tok
      |FROM tok t JOIN th USING (source)
      |WHERE thr_int >= 256
      |   OR substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 2) <
      |      lower(lpad(to_hex(thr_int), 2, '0'))
      |ORDER BY doc_id""".stripMargin

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document
    * by the log importance ratio ln p_target(x) − ln q_raw(x) under two
    * hashed-token bag-of-words models — the target model trained on a
    * designated high-quality slice (here `source = 'src0'`, standing in
    * for the paper's Wikipedia/books target), the raw model on the whole
    * corpus — and keep the top-k. Features are tokens hashed into 256
    * buckets via the 2-hex-char md5 prefix (the paper's hashed n-gram
    * trick; the hex-prefix form is this file's draw idiom — no numeric
    * conversion, identical in DuckDB), with add-½ smoothing over the
    * bucket vocabulary. The paper samples with Gumbel noise; the
    * deterministic top-k variant here is its noise-free limit, which is
    * what makes the selection oracle-checkable row-for-row.
    *
    * Cross-engine determinism: the per-bucket weight is ONE ln per side
    * computed on a 256-row table, quantized to DECIMAL(28,8) and summed
    * exactly per document (the [[graft.operators.CorpusDedup.unigramSurpriseStats]]
    * idiom), so summation order can never flip the 4-dp round; ranking
    * ties break on doc_id.
    *
    * Scale shape: the two models are B-sized (256-row) map-side-combinable
    * aggregations; corpus/target totals are two bounded driver scalars;
    * scoring joins the token stream to the broadcast 256-row weight table
    * and rolls up per doc — the only corpus-wide shuffle — then top-k is
    * a TakeOrdered, never a global sort. At open-web scale B grows to
    * 10k-100k buckets and stays broadcastable. */
  def dsirSelect(s: SparkSession, d: String): DataFrame =
    dsirSelectOf(Tables.documents(s, d))

  def dsirSelectOf(docs: DataFrame, target: String = "src0", k: Int = 100): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val numBuckets = 256
    val tok = docs
      .select($"doc_id", $"source", explode(split($"text", " ")).as("tk"))
      .select($"doc_id", $"source", substring(md5($"tk"), 1, 2).as("b"))
    val raw = tok.groupBy($"b").agg(count(lit(1)).as("cr"))
    val tgt = tok.filter($"source" === target)
      .groupBy($"b").agg(count(lit(1)).as("ct"))
    val totRaw = tok.count().toDouble + 0.5 * numBuckets
    val totTgt = tok.filter($"source" === target).count().toDouble + 0.5 * numBuckets
    val w = raw.join(tgt, Seq("b"), "left")
      .select($"b",
        (log((coalesce($"ct", lit(0L)) + lit(0.5)) / lit(totTgt)) -
          log(($"cr" + lit(0.5)) / lit(totRaw))).cast("decimal(28,8)").as("dw"))
    tok.join(broadcast(w), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum($"dw").cast("double"), 4).as("log_ratio"))
      .orderBy($"log_ratio".desc, $"doc_id")
      .limit(k)
  }

  val dsirSelectOracle: String =
    """WITH tk AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tk
      |            FROM documents),
      |tok AS (SELECT doc_id, source, substr(md5(tk), 1, 2) AS b FROM tk),
      |r AS (SELECT b, count(*) AS cr FROM tok GROUP BY b),
      |t AS (SELECT b, count(*) AS ct FROM tok WHERE source = 'src0' GROUP BY b),
      |tot AS (SELECT (SELECT count(*) FROM tok) AS tr,
      |               (SELECT count(*) FROM tok WHERE source = 'src0') AS tt),
      |w AS (SELECT b, CAST(ln((coalesce(ct, 0) + 0.5) / (tt + 128.0))
      |               - ln((cr + 0.5) / (tr + 128.0)) AS DECIMAL(28,8)) AS dw
      |      FROM r LEFT JOIN t USING (b) CROSS JOIN tot)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(round(CAST(sum(dw) AS DOUBLE), 4) AS DOUBLE) AS log_ratio
      |FROM tok JOIN w USING (b)
      |GROUP BY doc_id ORDER BY log_ratio DESC, doc_id LIMIT 100""".stripMargin

  /** Weighted sampling WITHOUT replacement, k = 100, weight ∝ `n_chars`
    * — the Efraimidis–Spirakis exponential-key scheme (Inf. Proc. Letters
    * 97(5), 2006): each row draws u ~ U(0,1] and is ranked by
    * key = ln(u)/w; the k LARGEST keys are exactly a weighted sample
    * without replacement. The draw u comes from the first 48 bits of
    * `md5(doc_id)` — the same deterministic no-`rand()` discipline as
    * every sampler here (see the object doc), which is what makes a
    * "random" weighted sample oracle-checkable cross-engine.
    *
    * Scale shape: the key is a narrow per-row expression (no shuffle, no
    * model state); the global top-k plans TakeOrderedAndProject —
    * per-partition size-k heaps merged on the driver, the same
    * 100 TB-safe shape as `topk_orders`. A weighted sample of any corpus
    * costs one scan.
    *
    * Selection determinism: both engines evaluate ln on IEEE doubles
    * built from identical integer operands; keys of distinct docs are
    * continuous-valued with gaps ~1e-4 at the k-boundary, so a ≤1-ulp
    * libm difference cannot flip membership. The REPORTED key is rounded
    * to 6 dp on both sides and ties in the ORDER BY fall back to doc_id. */
  def weightedSample(s: SparkSession, d: String, k: Int = 100): DataFrame = {
    import s.implicits._
    val u = (conv(substring(md5($"doc_id".cast("string")), 1, 12), 16, 10)
      .cast("double") + lit(1.0)) / lit(281474976710657.0) // 16^12 + 1
    Tables.documents(s, d)
      .select($"doc_id", $"lang", $"n_chars",
        (log(u) / $"n_chars".cast("double")).as("k_raw"))
      .orderBy($"k_raw".desc, $"doc_id")
      .limit(k)
      .select($"doc_id", $"lang", $"n_chars", round($"k_raw", 6).as("es_key"))
      .orderBy($"es_key".desc, $"doc_id")
  }

  val weightedSampleOracle: String =
    """WITH keyed AS (
      |  SELECT doc_id, lang, n_chars,
      |         ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
      |              AS BIGINT) + 1.0) / 281474976710657.0)
      |           / CAST(n_chars AS DOUBLE) AS k_raw
      |  FROM documents)
      |SELECT doc_id, lang, n_chars,
      |       CAST(round(k_raw, 6) AS DOUBLE) AS es_key
      |FROM (SELECT * FROM keyed ORDER BY k_raw DESC, doc_id LIMIT 100)
      |ORDER BY es_key DESC, doc_id""".stripMargin

  /** Poisson-bootstrap confidence interval for a pipeline metric (mean
    * purchase value) — the standard way to put error bars on a statistic
    * at scale WITHOUT resampling passes (Chamandy et al., "Estimating
    * Uncertainty for Massive Data Streams", Google 2012): true bootstrap
    * resampling needs the row count up front and a pass per replicate;
    * Poisson(1) weights are independent per (row, replicate), so ALL B
    * replicates ride ONE scan — each row fans out to B weighted copies
    * (a map-side explode, no extra shuffle) and one keyed aggregation
    * produces every replicate's statistic. CI = order statistics of the
    * B replicate means.
    *
    * Engine-portability: the Poisson draw inverts the CDF at a
    * deterministic md5 uniform (same draw family as [[weightedSample]]),
    * the metric is exact integer cents, and every replicate mean is an
    * integer-division micro fixed point — both engines agree bit-for-bit
    * on every intermediate, so even the ORDER STATISTICS match exactly
    * (no float sum-order risk anywhere). Overflow bound: Σ w·cents ≤
    * 8·4.9e6·rows — safe through ~1e11 purchase rows in the i64 sum;
    * past that, pre-aggregate cents per shard first (same plan shape). */
  /** Default replicate count — the oracle SQL below is STRING-INTERPOLATED
    * from this value and [[ciIndices]] (round-12 advice: a hardcoded
    * a[2]/a[31] in the oracle would silently desync if reps changed). */
  val BootstrapReps: Int = 32

  /** 1-based order-statistic indices of the 5th/95th percentile replicate
    * means — shared by the Spark plan and the interpolated oracle. */
  def ciIndices(reps: Int): (Int, Int) =
    (math.ceil(0.05 * reps).toInt, math.ceil(0.95 * reps).toInt)

  /** Cumulative Poisson(1) CDF at k = 0..7 — the SAME array renders the
    * Spark `when` chain and the oracle's CASE literals (Double.toString
    * round-trips exactly, so both engines compare against identical
    * constants); u beyond the last entry draws the tail weight 8. */
  private val PoissonCdf = Array(0.36787944117144233, 0.7357588823428847,
    0.9196986029286058, 0.9810118431238462, 0.9963401531726563,
    0.9994058151824183, 0.9999167588507119, 0.9999897508033253)

  def bootstrapCi(s: SparkSession, d: String, reps: Int = BootstrapReps): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.Column
    val cdf = PoissonCdf
    val u = (conv(substring(md5(concat($"event_id".cast("string"), lit(":"),
        $"rep".cast("string"), lit(":bs42"))), 1, 15), 16, 10)
      .cast("double") + lit(0.5)) / lit(math.pow(16.0, 15))
    val w = cdf.zipWithIndex.reverse.foldLeft(lit(8L): Column) {
      case (acc, (c, i)) => when($"u" < lit(c), lit(i.toLong)).otherwise(acc)
    }
    val means = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"event_id",
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .withColumn("rep", explode(sequence(lit(0), lit(reps - 1))))
      .withColumn("u", u)
      .withColumn("w", w)
      .groupBy($"rep")
      .agg(sum($"w" * $"cents").as("swx"), sum($"w").as("sw"))
      .select($"rep", expr("(100 * swx) div sw").as("mean_e4"))
    val (lo, hi) = ciIndices(reps)
    means.agg(count(lit(1)).as("n_reps"),
        expr("sum(mean_e4) div count(1)").as("mean_of_means_e4"),
        sort_array(collect_list($"mean_e4")).as("a"))
      .select($"n_reps", $"mean_of_means_e4",
        element_at($"a", lo).as("ci_lo_e4"),
        element_at($"a", hi).as("ci_hi_e4"))
  }

  /** Interpolated from [[BootstrapReps]], [[ciIndices]] and [[PoissonCdf]]
    * — the SAME values the Spark plan uses — so changing any parameter
    * cannot desync the query from its oracle (the dpHistogram pattern). */
  val bootstrapCiOracle: String = {
    val (lo, hi) = ciIndices(BootstrapReps)
    val cases = PoissonCdf.zipWithIndex
      .map { case (c, i) => s"WHEN u < $c THEN $i" }
      .mkString("CASE ", "\n                  ", "\n                  ELSE 8 END")
    s"""WITH base AS (
       |  SELECT event_id, CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events WHERE event_type = 'purchase'),
       |r AS (SELECT event_id, cents, rep
       |      FROM base CROSS JOIN (SELECT unnest(range($BootstrapReps)) AS rep)),
       |u AS (SELECT cents, rep,
       |             (('0x' || substr(md5(event_id::VARCHAR || ':' ||
       |                rep::VARCHAR || ':bs42'), 1, 15))::BIGINT + 0.5)
       |               / 1152921504606846976.0 AS u
       |      FROM r),
       |w AS (SELECT cents, rep,
       |             $cases AS w
       |      FROM u),
       |m AS (SELECT rep, CAST((100 * sum(w * cents)) // sum(w) AS BIGINT)
       |               AS mean_e4
       |      FROM w GROUP BY rep),
       |arr AS (SELECT list_sort(list(mean_e4)) AS a,
       |               CAST(count(*) AS BIGINT) AS n_reps,
       |               CAST(sum(mean_e4) // count(*) AS BIGINT)
       |                 AS mean_of_means_e4
       |        FROM m)
       |SELECT n_reps, mean_of_means_e4,
       |       CAST(a[$lo] AS BIGINT) AS ci_lo_e4,
       |       CAST(a[$hi] AS BIGINT) AS ci_hi_e4
       |FROM arr""".stripMargin
  }

  val defs: Seq[Q] = Seq(
    Q("agg_bootstrap_ci", Some(bootstrapCiOracle), (s, d) => bootstrapCi(s, d)),
    Q("doc_weighted_sample", Some(weightedSampleOracle), weightedSample(_, _)),
    Q("doc_token_budget_mix", Some(tokenBudgetMixOracle), tokenBudgetMix),
    Q("doc_dsir_select", Some(dsirSelectOracle), dsirSelect),
    Q("doc_global_shuffle", Some(globalShuffleOracle), globalShuffle(_, _)),
    Q("doc_stratified_sample", Some(stratifiedSampleOracle), stratifiedSample),
    Q("doc_kfold_assign", Some(kfoldAssignOracle), kfoldAssign),
    Q("doc_train_test_split", Some(trainTestSplitOracle), trainTestSplit),
    Q("doc_mixture_sample", Some(mixtureSampleOracle), mixtureSample(_, _)),
    Q("doc_epoch_mix", Some(epochMixOracle), epochMix),
    Q("doc_leakage_split", Some(leakageFreeSplitOracle), leakageFreeSplit),
    Q("doc_source_cap", Some(sourceCapOracle), sourceCap(_, _)))
}
