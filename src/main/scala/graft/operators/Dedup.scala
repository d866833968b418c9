package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents`: exact (hash-groupBy), MinHash
  * signatures + LSH banding, exact n-gram Jaccard on LSH candidates, and
  * SimHash. Core training-data-pipeline surface (builder brief); the
  * reference has no dedup at all.
  *
  * Scale posture (100 TB corpus):
  *  - exact dedup is one shuffle keyed on the text (or its fingerprint);
  *  - MinHash signatures are a NARROW per-document map — k=32 hash mins
  *    computed with higher-order array functions, no explode, no shuffle;
  *  - candidate pairs come only from LSH band collisions (16 bands × 2
  *    rows). A shingle-inverted-index self-join is quadratic in document
  *    frequency and melts down on low-entropy corpora (a hot shingle in
  *    f docs creates f² pairs); banding bounds the blowup to genuinely
  *    similar documents;
  *  - exact Jaccard runs only on the candidate set via array_intersect on
  *    the per-doc shingle sets.
  */
object Dedup {

  /** The MinHash/LSH shape, in ONE place: k salted hash-minima per
    * signature, banded as LshBands × LshRows for candidate generation.
    * Every site that slices or scores a signature derives from these —
    * the k=16→32 migration had to touch six literal sites in lockstep
    * (round-3 review finding), which a missed site turns into silently
    * truncated band slices or a skewed estimate. Measured shapes are in
    * SCALE_NOTES.md Leg 2. */
  val MinHashK = 32
  val LshBands = 16
  val LshRows = 2
  require(LshBands * LshRows == MinHashK, "banding must tile the signature")

  /** Signature-estimated Jaccard (cheap long compares, no arrays touched):
    * fraction of agreeing minhash slots. Expects sig_a/sig_b columns. */
  private[operators] def estJaccardExpr =
    expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), v -> v = 1)) / $MinHashK.0")

  /** Exact dedup: keep the lowest doc_id per identical text. */
  def exactDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .groupBy($"text")
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", $"text")
      .orderBy($"doc_id")
  }

  val exactDedupOracle: String =
    """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text
      |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin

  /** Exact dedup keyed on the md5 content fingerprint instead of the text:
    * the 100 TB variant — shuffle rows are 32 hex chars + an id, not
    * documents. (Hash-collision risk at md5 scale is ~0 for dedup.) */
  def exactDedupByHash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", md5($"text".cast("binary")).as("fp"))
      .groupBy($"fp")
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", $"fp")
      .orderBy($"doc_id")
  }

  val exactDedupByHashOracle: String =
    """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, md5(text) AS fp
      |FROM documents GROUP BY md5(text) ORDER BY doc_id""".stripMargin

  /** Distinct 3-gram word-shingle set per doc, as an array column (docs with
    * <3 tokens dropped). Narrow map — no shuffle. */
  private[operators] def shingleSets(s: SparkSession, d: String): DataFrame =
    shingleSetsOf(Tables.documents(s, d))

  private[operators] def shingleSetsOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // widened: the shingle+minhash map is the pipeline's dominant
    // per-row cost and must not run in the scan's single task on a
    // one-row-group input (guide §2.5; downstream is hash/exact math)
    graft.Tables.widened(docs)
      .select($"doc_id", split($"text", " ").as("__w"))
      .filter(size($"__w") >= 3)
      .select($"doc_id", expr(ShingleExpr).as("sh"))
  }

  /** The 3-gram shingle ARRAY expression over a pre-split token column
    * `__w` — THE shingle definition, shared by the per-doc dedup path
    * ([[shingleSetsOf]]) and the per-source overlap census
    * ([[sourceOverlap]]) so a width or tokenization change cannot
    * silently drift them apart. ([[setSimilarityJoin]] deliberately
    * keeps its own short-doc-inclusive variant: its SQL oracle
    * re-derives that exact pipeline shingle-for-shingle.)
    *
    * Callers MUST project `split(text, ' ') AS __w` first: the earlier
    * form inlined `split(text, ' ')` inside the transform lambda, where
    * it is re-evaluated for EVERY shingle position — O(tokens²) string
    * work per document (measured 1.7 s of dedup_ngram_jaccard's 2.9 s at
    * sf0.1; the split itself is the dominant cost and lambda-bound
    * subtrees are outside codegen subexpression elimination). Splitting
    * once in a prior projection is pure common-subexpression hoisting:
    * byte-identical shingle sets. */
  private[operators] val ShingleExpr: String =
    """array_distinct(transform(sequence(0, size(__w) - 3),
      |                         i -> concat_ws(' ', slice(__w, i + 1, 3))))"""
      .stripMargin

  /** k=32 MinHash signature per doc: sig[k] = min over shingles of a
    * k-salted hash. Each shingle STRING is hashed exactly once; the k
    * variants re-hash the resulting long (string hashing is the dominant
    * cost — 32× re-hashing strings would be 32× the work). Pure per-row
    * computation, no shuffle. */
  private[operators] def withMinhashSig(shingled: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(shingled.sparkSession)
    shingled
      .withColumn("hs", expr("transform(sh, s -> xxhash64(s))"))
      .withColumn("sig", call_function(graft.functions.GraftFunctions.MinHashName, col("hs")))
      .drop("hs")
  }

  /** LSH candidate pairs: docs agreeing on ≥1 of 16 bands (2 minhashes per
    * band, k=32 signature). Band shape measured on a 100k-doc corpus with
    * ground truth (SCALE_NOTES.md Leg 2; J≈0.55 true pairs): a J-similar
    * pair collides on an r-row band with p = J^r, on ≥1 of b bands with
    * 1-(1-J^r)^b. Measured recall/precision: 2×8 = 0.078/0.87,
    * 4×4 = 0.296/0.90, 8×4 = 0.417/0.90, 10×3 = 0.625/0.90,
    * 16×2 (adopted) = 0.901/0.499. Candidate precision is a COST dial,
    * not a correctness one — `nearDupPairs` verifies every candidate with
    * exact shingle Jaccard, so low-J false collisions are pruned; r=2 is
    * what a J≈0.55 dedup threshold requires (for a J≥0.8 threshold, 8×4
    * reaches 0.985 theoretical recall at far fewer candidates — the shape
    * is per-corpus tuning, these are the measured defaults).
    * Returns doc_a < doc_b with both shingle sets and signatures attached.
    *
    * Two scale guards, both essential at 100 TB:
    *  - the pair-generation shuffle carries ONLY (band, key, doc_id) —
    *    shingle sets and signatures are re-attached after pair dedup, so
    *    the shuffle rows are a few dozen bytes, not documents;
    *  - degenerate buckets (band keys shared by >500 docs — boilerplate/
    *    template content) are dropped before pairs form: one hot key
    *    would otherwise create a quadratic pair explosion (and bounds
    *    the per-bucket member list at ≤500 ids ≈ 4 KB). */
  /** Collect a small (≤ limit-bounded) result and release the persisted
    * relations backing it: without this, every pair query run in a
    * long-lived session (Verify/Bench run all of them) pins its caches in
    * executor memory for the session lifetime. */
  private def materializeAndRelease(out: DataFrame, cached: DataFrame*): DataFrame = {
    val rows = java.util.Arrays.asList(out.collect(): _*)
    cached.foreach(_.unpersist(blocking = false))
    out.sparkSession.createDataFrame(rows, out.schema)
  }

  /** The (doc_id, band, key) relation of a (doc_id, sig, …) frame — THE
    * banding definition, shared by the batch candidate join and the
    * incremental triage so a band-shape change cannot drift them apart
    * (the k=16→32 migration had to touch six literal sites in lockstep;
    * this collapses the two banding ones into one). */
  private[operators] def bandKeysOf(sigs: DataFrame): DataFrame = {
    val s = sigs.sparkSession
    import s.implicits._
    sigs.select($"doc_id", explode(expr(
        s"""transform(sequence(0, ${LshBands - 1}),
           |          b -> named_struct('band', b, 'key', xxhash64(slice(sig, b * $LshRows + 1, $LshRows))))"""
          .stripMargin)).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.key")
  }

  /** Exact shingle-set Jaccard rounded to 4 dp — the one scoring column
    * both the batch pair pipeline and the incremental triage report. */
  private[operators] def exactJaccardCol(shA: org.apache.spark.sql.Column,
      shB: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(size(array_intersect(shA, shB)).cast("double") /
      size(array_union(shA, shB)), 4)

  /** Returns (candidate pairs, the persisted signature relation backing
    * them — caller must release it, see materializeAndRelease). */
  private[operators] def lshCandidates(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    // The signature relation is referenced 5× in this DAG (banding, bucket
    // census, both join sides, both re-attachments) — persist it so the
    // per-document hashing runs once, not five times. It is small: ids +
    // 32 longs + the shingle array per doc. Callers release it via
    // materializeAndRelease.
    val sigs = withMinhashSig(shingleSets(s, d)).persist()
    val banded = bandKeysOf(sigs)
    // Bucket pairs in ONE shuffle of the banded relation, with the
    // degenerate-bucket cap applied BEFORE any member list exists: a
    // window count over (band, key) sizes each bucket — WindowExec's
    // group buffer is an ExternalAppendOnlyUnsafeRowArray, so a hot
    // band key (boilerplate shared by millions of docs at the 100 TB
    // posture) SPILLS to disk while being counted instead of
    // materializing in an aggregation buffer (the round-15 ADVICE
    // hazard) — then collect_list runs only on the surviving 2..500
    // buckets (≤4 KB per group by construction) and the ordered pairs
    // explode map-side. The groupBy keys equal the window partition
    // keys, so both run on the window's single exchange (guide §2.4);
    // the round-16a census semi-join spelling re-derived `banded` on
    // both join sides and measured 2× slower at sf0.1.
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy($"band", $"key")
    val pairs = banded
      .withColumn("n", count(lit(1)).over(wBucket))
      .filter($"n".between(2, 500))
      .groupBy($"band", $"key")
      .agg(collect_list($"doc_id").as("ids"))
      .select(explode($"ids").as("doc_a"), $"ids")
      .select($"doc_a", explode($"ids").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
      .dropDuplicates("doc_a", "doc_b")
    (pairs
      .join(sigs.select($"doc_id".as("doc_a"), $"sig".as("sig_a")), "doc_a")
      .join(sigs.select($"doc_id".as("doc_b"), $"sig".as("sig_b")), "doc_b"),
      sigs)
  }

  /** Exact n-gram Jaccard on the LSH candidate set: top-20 most similar
    * pairs. (Rows-only check: set algebra has no portable SQL oracle.)
    *
    * Cost shape: the r=2 banding admits many low-J candidates (candidate
    * precision ≈0.5, SCALE_NOTES Leg 2), so the exact set intersection —
    * the expensive step, O(|sh_a|+|sh_b|) per pair on string arrays — is
    * gated behind a signature pre-filter: estimated Jaccard from the two
    * 32-long signatures (cheap long compares) must reach 0.25 first. For a
    * truly-similar pair (J ≥ 0.5) the estimate is Binomial(32, J)/32 —
    * P(est < 0.25) < 0.3% — so the top-20 survives while ~half the
    * candidate set never touches its shingle arrays (the shingle attach
    * joins run AFTER the filter, so dropped pairs never shuffle a set). */
  /** LSH candidates with EXACT shingle Jaccard attached — the one pipeline
    * both the pair query and the cluster builder consume (a drifted copy
    * would let them disagree on what counts as a near-dup). Est-prefilter
    * at 0.25 gates the expensive shingle joins; exact Jaccard rounded to
    * 4 dp. Returns (pairs with `jaccard`, the persisted sigs relation the
    * caller must release). */
  private[operators] def exactJaccardPairs(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val (cands, sigs) = lshCandidates(s, d)
    val survivors = cands
      .filter(estJaccardExpr >= 0.25)
      .select($"doc_a", $"doc_b")
    (survivors
      .join(sigs.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(sigs.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        exactJaccardCol($"sh_a", $"sh_b").as("jaccard")),
      sigs)
  }

  /** Verified-pair artifact: the (doc_a, doc_b, exact jaccard) relation
    * that survives the est≥0.25 prefilter is consumed by two registered
    * queries (top-20 pairs, clustering) plus keep-best downstream —
    * building the LSH→Jaccard pipeline once per session is right. But the
    * relation is proportional to corpus NEAR-DUPLICATION (1.7M candidates
    * at just 100k docs — SCALE_NOTES Leg 2), so it is materialized as a
    * session-scoped parquet artifact and served as a FileScan, exactly
    * like [[Similarity.ivfIndexDir]]; it never rides through the driver
    * (the round-5 driver-row memo here was a 100×-scale driver OOM by
    * design). Staleness caveat as ever: keyed on the corpus dir, which is
    * content-addressed enough for the static test corpora. */
  private[operators] def verifiedPairs(s: SparkSession, d: String): DataFrame =
    SessionCaches.parquetArtifact(s, s"dedup-verified-pairs:$d") { dir =>
      val (pairs, sigs) = exactJaccardPairs(s, d)
      pairs.write.mode("overwrite").parquet(dir)
      sigs.unpersist(blocking = false)
    }

  def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    verifiedPairs(s, d).orderBy($"jaccard".desc, $"doc_a", $"doc_b").limit(20)
  }

  /** MinHash-estimated Jaccard on the LSH candidate set: top-50 pairs. */
  def minhashLshPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (cands, sigs) = lshCandidates(s, d)
    materializeAndRelease(
      cands
        // double, not decimal: the estimate is an exact multiple of 1/32 (k=32),
        // and the golden oracle round-trips through DuckDB, which widens
        // decimals to float64 (a decimal column would hash-mismatch on
        // dtype alone)
        .select($"doc_a", $"doc_b",
          round(estJaccardExpr, 4).cast("double").as("est_jaccard"))
        .orderBy($"est_jaccard".desc, $"doc_a", $"doc_b")
        .limit(50),
      sigs)
  }

  /** 64-bit SimHash per document, computed entirely with higher-order array
    * expressions (no UDF, no explode — a narrow map even at 100 TB):
    * bit i of the hash is the sign of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). */
  private[operators] def withSimhash(df: DataFrame): DataFrame =
    // Tokens are hashed once into longs; the 64 bit-sums then operate on
    // longs only (re-hashing the token string per bit would be 64× the
    // string-hash cost).
    {
      graft.functions.GraftFunctions.register(df.sparkSession)
      // widened: per-row hashing, single-task on a one-row-group scan
      graft.Tables.widened(df).withColumn("hs", expr(
          "transform(array_distinct(split(text, ' ')), t -> xxhash64(t))"))
        .withColumn("simhash",
          call_function(graft.functions.GraftFunctions.SimHashName, col("hs")))
        .drop("hs")
    }

  /** Per-document SimHash values (rows-only; deterministic). */
  def simhashDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withSimhash(Tables.documents(s, d))
      .select($"doc_id", $"simhash")
      .orderBy($"doc_id")
  }

  /** SimHash near-dup edge set: banded candidate generation (4 × 16-bit
    * blocks), then exact Hamming check via bit_count(xor). The block
    * count is the recall dial (pigeonhole): a Hamming-h pair collides on
    * ≥1 untouched block whenever h < 4, so recall is GUARANTEED for
    * h ≤ 3 and probabilistic above (an h-bit difference is missed only
    * when the h bits cover all 4 blocks — impossible for h ≤ 3,
    * increasingly unlikely per-pair to matter as h grows because such
    * pairs are barely near-dups). The previous 2 × 32 shape guaranteed
    * only h ≤ 1 while the cluster contract advertises ≤ 6 — a pair
    * differing by one bit in EACH half was silently never a candidate.
    * Same two scale guards as lshCandidates: narrow join payload (ids +
    * one long) and a degenerate-bucket cap — correlated bits on
    * boilerplate-heavy corpora otherwise make one band key quadratic.
    * Returns the UNLIMITED (doc_a, doc_b, hamming) relation + the
    * persisted hash relation the caller must release. */
  private[operators] val SimhashBands = 4

  /** The (doc_id, simhash, band, key) block-key relation of a
    * (doc_id, simhash) frame — extracted so the pigeonhole recall
    * property is testable on planted hashes (SimhashBandingSpec). */
  private[operators] def simhashBandKeys(hashed: DataFrame): DataFrame = {
    val s = hashed.sparkSession
    import s.implicits._
    hashed.select($"doc_id", $"simhash",
      explode(expr(
        s"""transform(sequence(0, ${SimhashBands - 1}),
           |          b -> named_struct('band', b,
           |                            'key', shiftright(simhash, b * ${64 / SimhashBands}) & ${(1L << (64 / SimhashBands)) - 1}))"""
          .stripMargin)).as("bk"))
      .select($"doc_id", $"simhash", $"bk.band", $"bk.key")
  }

  private[operators] def simhashEdges(s: SparkSession, d: String,
      maxHamming: Int): (DataFrame, DataFrame) = {
    import s.implicits._
    // ONE consumer in the one-shuffle shape below (the collected struct
    // carries simhash through, so there is no re-attachment join) — no
    // persist; the returned handle keeps materializeAndRelease callers
    // source-compatible (unpersist on an uncached frame is a no-op).
    val hashed = withSimhash(Tables.documents(s, d))
      .select($"doc_id", $"simhash")
    val banded = simhashBandKeys(hashed)
    // Bucket pairs in ONE shuffle (the lshCandidates shape): a window
    // count over (band, key) sizes each bucket with a DISK-SPILLABLE
    // group buffer, so a hot block key never materializes in memory
    // (the round-15 ADVICE hazard); collect_list then runs only on the
    // surviving 2..500 buckets (≤8 KB per group by construction), and
    // the groupBy reuses the window's exchange (guide §2.4). The
    // round-16a census semi-join spelling re-derived `banded` on both
    // join sides and measured ~2× slower at sf0.1.
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy($"band", $"key")
    (banded
      .withColumn("n", count(lit(1)).over(wBucket))
      .filter($"n".between(2, 500))
      .groupBy($"band", $"key")
      .agg(collect_list(struct($"doc_id", $"simhash")).as("ms"))
      .select(explode($"ms").as("a"), $"ms")
      .select($"a", explode($"ms").as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        expr("bit_count(a.simhash ^ b.simhash)").cast("int").as("hamming"))
      .filter($"hamming" <= maxHamming)
      .dropDuplicates("doc_a", "doc_b"),
      hashed)
  }

  /** Top-50 most-similar simhash pairs (rows-only check). */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (edges, hashed) = simhashEdges(s, d, maxHamming = 16)
    materializeAndRelease(
      edges.orderBy($"hamming", $"doc_a", $"doc_b").limit(50),
      hashed)
  }

  /** Near-dup clusters from SIMHASH evidence (Hamming ≤ 6 of 64 bits ≈
    * cosine-similar token multisets): the same connected-components step,
    * fed by a different similarity signal — dedup evidence is pluggable.
    * Output shape matches [[nearDupClusters]]. Rows-only check. */
  def simhashClusters(s: SparkSession, d: String, maxHamming: Int = 6): DataFrame = {
    import s.implicits._
    // The cluster mapping is proportional to corpus near-duplication —
    // artifact, not driver rows (see verifiedPairs). Ordering is applied
    // after the FileScan: parquet does not preserve row order.
    SessionCaches.parquetArtifact(s, s"dedup-simhash-clusters:$d:$maxHamming") { dir =>
      val (edges, hashed) = simhashEdges(s, d, maxHamming)
      val clusters = connectedComponents(edges.select($"doc_a", $"doc_b"))
      clusterMapping(clusters).write.mode("overwrite").parquet(dir)
      hashed.unpersist(blocking = false)
      SessionCaches.freeLocalCheckpoint(clusters)
    }.orderBy($"doc_id")
  }

  /** (doc_id, cluster_id) labels → the registered cluster-mapping shape:
    * cluster size attached, `keep = 1` on the min-id representative. */
  private[operators] def clusterMapping(clusters: DataFrame): DataFrame = {
    val s = clusters.sparkSession
    import s.implicits._
    clusters
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy($"cluster_id")))
      .withColumn("keep", ($"doc_id" === $"cluster_id").cast("int"))
      .select($"doc_id", $"cluster_id",
        $"cluster_size".cast("long").as("cluster_size"), $"keep")
  }

  /** Connected components over a pair graph, by iterative min-label
    * propagation — the step that turns PAIRWISE near-dup evidence into the
    * CLUSTERS a dedup actually removes (pairs alone under-delete: a, b, c
    * mutually similar is one cluster of three, not three independent
    * pairs; and transitive chains a~b~c must merge even when (a, c) was
    * never a candidate pair).
    *
    * Each iteration: one adjacency⋈labels join pushes every neighbor's
    * label to each vertex, a hash aggregation takes the min, and a
    * labels-sized pointer-jump self-join (label := label(label(v)))
    * shortcuts stale pointer chains — so propagation needs roughly
    * diameter/2 rounds instead of diameter (8 vs 14 measured on the
    * sf0.1 simhash Hamming graph), each round one shuffle stage cheaper
    * than the two-endpoint-join formulation it replaced. `maxIters`
    * bounds the worst case and convergence is detected by an
    * unchanged-label count. At 100 TB this is the standard iterative
    * min-label CC with path shortcutting (the shuffle key is a vertex id
    * throughout; label state is one long per doc).
    *
    * @param edges  (doc_a, doc_b) pairs
    * @param maxIters iteration bound; min-label propagation needs
    *                 O(component diameter) rounds, so 20 covers any
    *                 plausible near-dup graph
    * @param strict  when true (default), throw if the bound is exhausted
    *                before convergence — an unconverged result is WRONG
    *                (one true component reported as several, a dedup
    *                under-deletes) and must not pass silently
    * @return (doc_id, cluster_id) — cluster_id is the component's min doc
    */
  /** Edge-count ceiling for the driver union-find shortcut. The honest
    * heap cost is JVM-object cost, not payload: 1M collected Row/boxed
    * tuples plus a boxed HashMap of ≤2M entries is ~100–200 MB transient —
    * trivial for this driver (128 GiB) but 10× the raw 16 B/edge, so the
    * ceiling is set for the OBJECT cost (a production tightening is a
    * primitive-long sorted-array union-find, ~16 MB at this ceiling).
    * Above it, the distributed loop runs on the still-persisted edges. */
  private[operators] val DriverCcMaxEdges = 1000000L

  def connectedComponents(edges: DataFrame, maxIters: Int = 20,
                          strict: Boolean = true): DataFrame =
    connectedComponents(edges, maxIters, strict, DriverCcMaxEdges)

  /** Size-adaptive connected components. The candidate graph a near-dup
    * pipeline emits is orders of magnitude smaller than the corpus (it is
    * the post-banding, post-verification edge set), so at local/medium
    * scale it fits the driver with room to spare — and an iterative
    * shuffle loop whose per-round FIXED cost is ~0.3 s cannot beat an
    * O(E·α) union-find that finishes in milliseconds. The ceiling keeps
    * the shortcut honest: past [[DriverCcMaxEdges]] the distributed
    * min-label/pointer-jumping loop below takes over unchanged (that path
    * stays spec-pinned via the threshold override in ClusterDedupSpec,
    * and both paths are asserted label-equivalent on the same graphs). */
  private[operators] def connectedComponents(edges: DataFrame, maxIters: Int,
                          strict: Boolean, driverMaxEdges: Long): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val pairs = edges.select($"doc_a", $"doc_b").persist()
    val nEdges = pairs.count()
    if (nEdges <= driverMaxEdges) {
      val es = pairs.as[(Long, Long)].collect()
      pairs.unpersist(blocking = false)
      // path-compressing union-find; roots = min vertex id of the
      // component so labels match the distributed loop's min-label fixpoint
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val p = parent(c); parent(c) = r; c = p }
        r
      }
      es.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val (lo, hi) = (math.min(ra, rb), math.max(ra, rb)); parent(hi) = lo }
      }
      val labels = parent.keys.toSeq.map(v => (v, find(v)))
      s.createDataFrame(labels).toDF("doc_id", "cluster_id")
    } else {
      // Hand the PERSISTED relation to the distributed loop — its first
      // localCheckpoint (eager) reads the cached partitions instead of
      // re-deriving the candidate-join lineage, which is the costliest
      // input exactly in this branch; release only after that has run.
      val labels = connectedComponentsDistributed(pairs, maxIters, strict)
      pairs.unpersist(blocking = false)
      labels
    }
  }

  private[operators] def connectedComponentsDistributed(
      edges: DataFrame, maxIters: Int = 20, strict: Boolean = true): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    // localCheckpoint (not persist) each iteration: an iterative DataFrame
    // loop otherwise nests every prior plan inside the next one — the
    // logical plan grows exponentially and planning itself OOMs long
    // before any data does. Checkpointing truncates lineage to the
    // materialized partitions, keeping iteration i's plan O(1) deep.
    // Bidirectional adjacency (v, n): ONE join per round against the
    // neighbor's label replaces the round-3 version's two edge-endpoint
    // joins — same shuffled volume, one fewer shuffle stage per round
    // (measured 26% off CC wall-time at sf0.1 on the 79k-edge simhash
    // graph before pointer jumping).
    val adj = edges
      .select($"doc_a".as("v"), $"doc_b".as("n"))
      .union(edges.select($"doc_b".as("v"), $"doc_a".as("n")))
      .localCheckpoint()
    var labels = adj.select($"v").distinct()
      .withColumn("cluster_id", $"v")
      .localCheckpoint()
    var converged = false
    var i = 0
    var checkpointed = labels // handle to the df owning the cached partitions
    while (!converged && i < maxIters) {
      // The labels branch of the union is tagged `own=true` so the SAME
      // aggregation that computes the new min-label also carries each
      // vertex's previous label through as min(c WHERE own) — every vertex
      // appears in exactly one own-branch row, so `prev` is its old label.
      // The convergence probe is then a filter+limit(1) over the freshly
      // checkpointed partitions: a cheap cached scan with early exit.
      val hop = adj
        .join(labels.select($"v".as("n"), $"cluster_id".as("c")), "n")
        .select($"v", $"c", lit(false).as("own"))
        .union(labels.select($"v", $"cluster_id".as("c"), lit(true).as("own")))
        .groupBy($"v")
        .agg(min($"c").as("cluster_id"), min(when($"own", $"c")).as("prev"))
      // Pointer jump (label := label(label(v))): labels are vertex ids, so
      // one labels-sized self-join lets a vertex adopt its labeler's newer
      // label in the same round — propagation covers ~2 hops per round on
      // chain-shaped components (measured: 14 rounds → 8 on the simhash
      // graph, whose Hamming-chain components have diameter ~14). The
      // left join + coalesce keeps vertices whose label has no own row
      // (impossible by construction, but cheap insurance).
      val m = hop.select($"v".as("cid"), $"cluster_id".as("c2"))
      val next = hop.join(m, $"cluster_id" === $"cid", "left")
        .select($"v", coalesce($"c2", $"cluster_id").as("cluster_id"), $"prev")
        .localCheckpoint()
      val changed = next.filter($"cluster_id" =!= $"prev").limit(1).count()
      // NOT Dataset.unpersist — that is a no-op for checkpoint blocks
      // (they live outside the CacheManager); free the prior round's
      // partitions explicitly or they pile up until a driver GC
      SessionCaches.freeLocalCheckpoint(checkpointed)
      checkpointed = next
      labels = next.select($"v", $"cluster_id")
      converged = changed == 0
      i += 1
    }
    SessionCaches.freeLocalCheckpoint(adj)
    if (!converged && strict)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIters iterations — " +
          "labels are partially propagated (one component would surface as " +
          "several); raise maxIters or pass strict=false to accept that")
    labels.select($"v".as("doc_id"), $"cluster_id")
  }

  /** Near-dup clusters on the documents table: LSH candidates → exact
    * shingle Jaccard ≥ threshold → connected components. The registered
    * output is the full (doc_id, cluster_id, cluster size, keep) mapping
    * for clustered docs — `keep = 1` marks the cluster representative (min
    * doc id), which is exactly the delete-list a corpus dedup applies.
    * Rows-only check (LSH-derived; no portable SQL oracle). */
  /** Cluster-mapping artifact: several consumers read the clustered
    * mapping — the registered cluster query, keep-best election, and
    * specs — so the LSH→Jaccard→CC pipeline builds once per session. The
    * mapping is proportional to corpus near-duplication, so like
    * [[verifiedPairs]] it is a parquet artifact served as a FileScan,
    * never driver rows. */
  def nearDupClusters(s: SparkSession, d: String, jThreshold: Double = 0.5): DataFrame = {
    import s.implicits._
    SessionCaches.parquetArtifact(s, s"dedup-neardup-clusters:$d:$jThreshold") { dir =>
      val edges = verifiedPairs(s, d)
        .filter($"jaccard" >= jThreshold).select($"doc_a", $"doc_b")
      val clusters = connectedComponents(edges)
      clusterMapping(clusters).write.mode("overwrite").parquet(dir)
      SessionCaches.freeLocalCheckpoint(clusters)
    }.orderBy($"doc_id")
  }

  /** Incremental connected-components maintenance — the refresh-family
    * member for CLUSTER LABELS (the IVF/LSH/postings/manifest/PCA refresh
    * pattern, extended to the one artifact that still forced a full
    * rebuild on append). Given the FROZEN label artifact of an earlier
    * build and the delta's pair evidence, produce labels equal to a full
    * CC over (base ∪ delta) edges — exactly, for ANY edge sets, by the
    * super-node argument: contracting each existing component to one
    * vertex preserves connectivity, so CC over {lift(e) : e ∈ delta}
    * (endpoints replaced by their component label, unlabeled endpoints by
    * themselves) computes precisely the merges the delta induces, and the
    * new min-label of a merged group is the min over its member doc ids —
    * the same label a from-scratch rebuild elects.
    *
    * Cost ∝ delta, never corpus: the super-node CC runs on |delta| edges
    * (the seeded pointer-jumping of the verdict item — only components
    * the delta touches participate), and the relabel is ONE scan of the
    * label artifact against a broadcast remap (one row per touched
    * component). Nothing re-reads corpus text, signatures, or base pair
    * evidence. */
  private[operators] def refreshClusterLabels(
      labels: DataFrame, deltaEdges: DataFrame): DataFrame = {
    val s = labels.sparkSession
    import s.implicits._
    val frozen = labels.select($"doc_id", $"cluster_id")
    // 1. Lift delta edges to super-node space. An endpoint with a frozen
    //    label is represented by that label; an endpoint the base never
    //    clustered (new doc, or an old never-duplicated doc) by itself.
    //    Lifted self-loops (both endpoints already in one component) drop
    //    out — they induce no merge.
    val superEdges = deltaEdges.select($"doc_a", $"doc_b")
      .join(frozen.select($"doc_id".as("doc_a"), $"cluster_id".as("la")),
        Seq("doc_a"), "left")
      .join(frozen.select($"doc_id".as("doc_b"), $"cluster_id".as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce($"la", $"doc_a").as("doc_a"),
        coalesce($"lb", $"doc_b").as("doc_b"))
      .filter($"doc_a" =!= $"doc_b")
    // 2. CC over the super-node graph only — O(|delta|).
    val remap = connectedComponents(superEdges)
      .select($"doc_id".as("super"), $"cluster_id".as("new_label"))
    // 3. Relabel. The remap is touched-components-sized, so it broadcasts;
    //    the label artifact is scanned once, never shuffled.
    val kept = frozen
      .join(broadcast(remap), frozen("cluster_id") === col("super"), "left")
      .select($"doc_id", coalesce($"new_label", $"cluster_id").as("cluster_id"))
    // Unlabeled delta endpoints ARE super-nodes (their own id — which can
    // never equal an existing cluster label: labels are min MEMBER ids,
    // and an unlabeled doc belongs to no cluster), so each gets its new
    // label straight from the remap.
    val deltaNodes = deltaEdges.select($"doc_a".as("doc_id"))
      .union(deltaEdges.select($"doc_b".as("doc_id"))).distinct()
    val fresh = deltaNodes
      .join(frozen.select($"doc_id"), Seq("doc_id"), "left_anti")
      .join(broadcast(remap), col("doc_id") === col("super"))
      .select($"doc_id", $"new_label".as("cluster_id"))
    kept.unionByName(fresh)
  }

  /** The registered incremental-clustering query: the deterministic
    * % 10 == 7 slice plays the appended batch (the incremental family's
    * shared fixture), the rest the standing corpus whose labels an
    * earlier ingest froze. The batch's pair evidence (any edge touching a
    * batch doc) is unioned into the frozen labels by
    * [[refreshClusterLabels]] — and because refresh ≡ rebuild exactly,
    * the output is row-for-row the SAME mapping as [[nearDupClusters]]'s
    * full rebuild, which is precisely how the driver gate checks it: the
    * oracle serves the full-rebuild golden (`dedup_cluster_docs`) plus
    * its structural laws, so any divergence between the incremental and
    * from-scratch paths fails the hard correctness gate. */
  def incrementalClusterRefresh(s: SparkSession, d: String,
      jThreshold: Double = 0.5): DataFrame = {
    import s.implicits._
    SessionCaches.parquetArtifact(s, s"dedup-cc-incr:$d:$jThreshold") { dir =>
      val batchTouch = ($"doc_a" % 10 === 7) || ($"doc_b" % 10 === 7)
      val pairs = verifiedPairs(s, d).filter($"jaccard" >= jThreshold)
      val frozenLabels = connectedComponents(
        pairs.filter(!batchTouch).select($"doc_a", $"doc_b"))
      val refreshed = refreshClusterLabels(frozenLabels,
        pairs.filter(batchTouch).select($"doc_a", $"doc_b"))
      clusterMapping(refreshed).write.mode("overwrite").parquet(dir)
      SessionCaches.freeLocalCheckpoint(frozenLabels)
    }.orderBy($"doc_id")
  }

  /** Keep-best canonicalization over the near-dup clusters: instead of
    * electing the min-doc_id representative (what [[nearDupClusters]]'s
    * `keep` flag does), elect the HIGHEST-QUALITY member — here the
    * longest document (n_chars desc, doc_id asc tiebreak), the "keep the
    * most complete variant" policy a corpus dedup actually wants when the
    * near-dup family is {page, truncated page, paginated fragment}.
    *
    * Output: one row per cluster — representative doc, member count, and
    * how many characters the policy saved vs min-id election. The cluster
    * relation is tiny relative to the corpus (only clustered docs appear),
    * so the quality join broadcasts under AQE; the per-cluster election is
    * a WindowGroupLimit-prunable row_number. Rows-only check (clusters
    * derive from LSH; no portable SQL oracle) — ClusterDedupSpec pins the
    * policy on a hand-built fixture. */
  def keepBestClusters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val clusters = nearDupClusters(s, d)
      .select($"doc_id", $"cluster_id", $"cluster_size")
    val quality = Tables.documents(s, d).select($"doc_id", $"n_chars")
    val w = Window.partitionBy($"cluster_id")
      .orderBy($"n_chars".desc, $"doc_id")
    clusters.join(quality, "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select(
        $"cluster_id",
        $"doc_id".as("kept_doc"),
        $"cluster_size".as("n_members"),
        $"n_chars".as("kept_chars"),
        ($"doc_id" =!= $"cluster_id").cast("int").as("differs_from_min_id"))
      .orderBy($"cluster_id")
  }

  /** Incremental ingest dedup — the daily shape at 100 TB: an incoming
    * batch is deduped (a) against the EXISTING corpus's fingerprint index
    * and (b) within itself, without ever rescanning corpus text. The
    * split here is deterministic (doc_id % 10 == 7 plays the incoming
    * batch, the rest the standing corpus).
    *
    * Scale shape: the corpus side collapses to its DISTINCT fingerprint
    * relation (32 hex chars/doc — in production a materialized,
    * hash-partitioned index maintained by the ingest job, cf. the
    * [[graft.operators.Search.postingsIndexDir]] build-once pattern);
    * the batch anti-joins it on the fingerprint (shuffle keyed on fp —
    * or exchange-free against a bucketed index), then elects first
    * occurrence per surviving fingerprint with one more fp-keyed
    * aggregation. The batch never joins corpus TEXT, and corpus cost is
    * index-lookup, not rescan. */
  def incrementalDedup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val fp = Tables.documents(s, d)
      .select($"doc_id", md5($"text".cast("binary")).as("fp"))
    val corpusIndex = fp.filter($"doc_id" % 10 =!= 7).select($"fp").distinct()
    val batch = fp.filter($"doc_id" % 10 === 7)
    batch
      .join(corpusIndex, Seq("fp"), "left_anti")
      .groupBy($"fp")
      .agg(min($"doc_id").as("doc_id"))
      .select($"doc_id", $"fp")
      .orderBy($"doc_id")
  }

  val incrementalDedupOracle: String =
    """WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
      |corpus AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 10 <> 7),
      |batch AS (SELECT * FROM fp WHERE doc_id % 10 = 7)
      |SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, fp
      |FROM batch WHERE fp NOT IN (SELECT fp FROM corpus)
      |GROUP BY fp ORDER BY doc_id""".stripMargin

  /** Incremental NEAR-dup triage — the missing member of the incremental
    * family (exact fp: [[incrementalDedup]]; substring spans:
    * [[CorpusDedup]]; semantic: [[Similarity.incrementalSemDedup]]): an
    * incoming batch is LSH-probed against the STANDING CORPUS's MinHash
    * signature index and each batch doc is triaged `dup_corpus` (with the
    * elected min-id corpus source and the exact verified Jaccard) or
    * `novel`. Same deterministic fixture as the semantic twin: corpus =
    * doc_id % 10 ≠ 7; batch = the % 10 == 7 slice plus exact copies of
    * the % 50 == 0 corpus docs at +1e9 (each must surface as a corpus
    * dup — its signature is identical to its source's).
    *
    * Scale shape: the corpus side is the (doc_id, sig, shingles)
    * signature index — in production materialized once and maintained
    * incrementally by [[refreshLshIndex]]'s append pattern, never
    * re-tokenized per batch. Banding shuffles only (band, key, doc_id)
    * triples, corpus-hot buckets are capped at 500 (boilerplate guard —
    * one viral template key would otherwise fan a batch doc into a
    * quadratic candidate set), the est ≥ 0.25 signature prefilter gates
    * the exact shingle joins, and the election is one batch-keyed
    * min-struct aggregation. Batch-internal near-dup stays the batch
    * clustering job ([[nearDupClusters]]) — the same bounded-state
    * division of labor documented for streaming semantic admission.
    * Within-batch exact repeats of a corpus dup elect the same source
    * independently, so triage stays per-doc deterministic. */
  def incrementalMinhashDedup(s: SparkSession, d: String,
      minJaccard: Double = 0.5): DataFrame = {
    import s.implicits._
    SessionCaches.parquetArtifact(s, s"dedup-minhash-incr:$d:$minJaccard") { dir =>
      val docs = Tables.documents(s, d)
      val batch = docs.filter($"doc_id" % 10 === 7)
        .select($"doc_id", $"text")
        .unionByName(docs.filter($"doc_id" % 50 === 0)
          .select(($"doc_id" + 1000000000L).as("doc_id"), $"text"))
      incrementalMinhashOf(docs.filter($"doc_id" % 10 =!= 7).select($"doc_id", $"text"),
          batch, minJaccard)
        .write.mode("overwrite").parquet(dir)
    }.orderBy($"doc_id")
  }

  /** The triage pipeline over arbitrary (doc_id, text) corpus/batch
    * relations — the unit under [[IncrementalMinhashSpec]]'s handcrafted
    * fixtures. */
  private[operators] def incrementalMinhashOf(corpus: DataFrame, batch: DataFrame,
      minJaccard: Double): DataFrame = {
    val s = corpus.sparkSession
    import s.implicits._
    {
      val corpusSigs = withMinhashSig(shingleSetsOf(corpus)).persist()
      val batchSigs = withMinhashSig(shingleSetsOf(batch)).persist()
      val cb = bandKeysOf(corpusSigs)
      val smallC = cb.groupBy($"band", $"key")
        .agg(count(lit(1)).as("bucket_n"))
        .filter($"bucket_n" <= 500)
        .select($"band", $"key")
      val cand = bandKeysOf(batchSigs)
        .join(cb.join(smallC, Seq("band", "key"))
          .select($"band", $"key", $"doc_id".as("src")), Seq("band", "key"))
        .select($"doc_id", $"src")
        .dropDuplicates("doc_id", "src")
      val verified = cand
        .join(batchSigs.select($"doc_id", $"sig".as("sig_a")), "doc_id")
        .join(corpusSigs.select($"doc_id".as("src"), $"sig".as("sig_b")), "src")
        .filter(estJaccardExpr >= 0.25)
        .join(batchSigs.select($"doc_id", $"sh".as("sh_a")), "doc_id")
        .join(corpusSigs.select($"doc_id".as("src"), $"sh".as("sh_b")), "src")
        .select($"doc_id", $"src",
          exactJaccardCol($"sh_a", $"sh_b").as("jaccard"))
        .filter($"jaccard" >= minJaccard)
      val elected = verified
        .groupBy($"doc_id")
        .agg(min(struct($"src", $"jaccard")).as("m"))
        .select($"doc_id", $"m.src".as("dup_src"), $"m.jaccard".as("jaccard"))
      val out = batch.select($"doc_id")
        .join(elected, Seq("doc_id"), "left")
        .select($"doc_id", $"dup_src", $"jaccard",
          when($"dup_src".isNotNull, "dup_corpus").otherwise("novel").as("status"))
        .localCheckpoint(eager = true)
      corpusSigs.unpersist(blocking = false)
      batchSigs.unpersist(blocking = false)
      out
    }
  }

  /** Invariant twin for the incremental triage: batch MEMBERSHIP and row
    * order are derived from the documents table (not the golden), each
    * flagged row's Jaccard is fully recomputed from the two texts (the
    * planted +1e9 ids map back to their source text) and must clear the
    * 0.5 threshold, dup_src must be a corpus doc, and status must agree
    * with dup_src presence. The golden pins only WHICH batch docs the LSH
    * probe flagged and their elected source — the recall facts SQL cannot
    * reproduce. */
  private def incrementalMinhashTwin: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
       |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |       FROM toks WHERE len(t) >= 3),
       |exp AS (SELECT doc_id FROM documents WHERE doc_id % 10 = 7
       |        UNION ALL
       |        SELECT doc_id + 1000000000 FROM documents WHERE doc_id % 50 = 0),
       |g AS (${Golden.dispatch("dedup_minhash_incremental")}),
       |j AS (SELECT g.doc_id, g.dup_src, g.status,
       |             round(len(list_intersect(a.sh, b.sh)) * 1.0 /
       |                   len(list_distinct(a.sh || b.sh)), 4) AS rj
       |      FROM g
       |      LEFT JOIN sh a ON a.doc_id =
       |        CASE WHEN g.doc_id >= 1000000000 THEN g.doc_id - 1000000000 ELSE g.doc_id END
       |      LEFT JOIN sh b ON b.doc_id = g.dup_src)
       |SELECT e.doc_id,
       |  CASE WHEN j.dup_src IS NULL OR (j.dup_src % 10 != 7 AND j.dup_src < 1000000000)
       |       THEN j.dup_src ELSE -1 END AS dup_src,
       |  CASE WHEN j.status = 'novel' THEN NULL
       |       WHEN j.rj >= 0.5 THEN j.rj ELSE -1 END AS jaccard,
       |  CASE WHEN (j.status = 'dup_corpus') = (j.dup_src IS NOT NULL)
       |       THEN j.status ELSE 'INCONSISTENT' END AS status
       |FROM exp e LEFT JOIN j ON e.doc_id = j.doc_id
       |ORDER BY e.doc_id""".stripMargin

  /** Invariant twin: the golden pins WHICH pairs the LSH surfaced; their
    * exact 3-gram-shingle Jaccard is recomputed from the documents table
    * in DuckDB (list_transform shingling + list_intersect/list_distinct —
    * the same set algebra, independently implemented). A wrong Jaccard
    * frozen at pin time now fails the hard gate. */
  private def jaccardRecomputed: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
       |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |       FROM toks WHERE len(t) >= 3),
       |g AS (${Golden.dispatch("dedup_ngram_jaccard")})
       |SELECT g.doc_a, g.doc_b,
       |       round(len(list_intersect(a.sh, b.sh)) * 1.0 /
       |             len(list_distinct(a.sh || b.sh)), 4) AS jaccard
       |FROM g JOIN sh a ON g.doc_a = a.doc_id JOIN sh b ON g.doc_b = b.doc_id
       |ORDER BY g.__row""".stripMargin

  /** Invariant twin: pair Hamming distances recomputed in DuckDB as
    * bit_count(xor) over the per-doc simhashes (themselves pinned by the
    * dedup_simhash_docs golden) — the pair arithmetic and the consistency
    * between the two goldens are both independently checked. */
  private def hammingRecomputed: String =
    s"""WITH h AS (SELECT doc_id, simhash FROM (${Golden.dispatch("dedup_simhash_docs")}) hh),
       |g AS (${Golden.dispatch("dedup_simhash_pairs")})
       |SELECT g.doc_a, g.doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM g JOIN h a ON g.doc_a = a.doc_id JOIN h b ON g.doc_b = b.doc_id
       |ORDER BY g.__row""".stripMargin

  /** Invariant twin for the cluster-mapping family: membership stays
    * golden-pinned (LSH/simhash evidence is not SQL-reproducible), but the
    * mapping's three structural laws are recomputed in DuckDB from the
    * golden itself — cluster_id = min member, cluster_size = member count,
    * keep ⇔ representative — so an inconsistent mapping frozen at pin
    * time fails the hard gate. */
  private def clusterStructureOracle(name: String): String =
    s"""WITH g AS (${Golden.dispatch(name)}),
       |w AS (SELECT *, count(*) OVER (PARTITION BY cluster_id) AS cs,
       |             min(doc_id) OVER (PARTITION BY cluster_id) AS mn FROM g)
       |SELECT doc_id,
       |  CASE WHEN cluster_id = mn THEN cluster_id ELSE -1 END AS cluster_id,
       |  CASE WHEN cluster_size = cs THEN cluster_size ELSE -1 END AS cluster_size,
       |  CASE WHEN keep = CAST(doc_id = cluster_id AS INT) THEN keep ELSE -1 END AS keep
       |FROM w ORDER BY __row""".stripMargin

  /** Invariant twin: kept_chars re-fetched from the documents table for
    * the kept doc (a wrong quality lookup fails), and the differs flag
    * recomputed from the ids. */
  private def keepBestRecomputed: String =
    s"""WITH g AS (${Golden.dispatch("dedup_keep_best")})
       |SELECT g.cluster_id, g.kept_doc, g.n_members,
       |  d.n_chars AS kept_chars,
       |  CASE WHEN g.differs_from_min_id = CAST(g.kept_doc != g.cluster_id AS INT)
       |       THEN g.differs_from_min_id ELSE -1 END AS differs_from_min_id
       |FROM g JOIN documents d ON g.kept_doc = d.doc_id ORDER BY g.__row""".stripMargin

  /** Invariant twin for the MinHash estimate: pairs/order stay
    * golden-pinned, but each estimate must (a) sit on the k/32 lattice
    * (MinHashK = 32; 4-dp rounding shifts `est*32` off an integer by at
    * most 1.6e-3, so 0.01 is a safe tolerance) and (b) land within 0.2 of
    * the exact shingle Jaccard DuckDB recomputes from the documents table
    * (observed estimator error ≤0.115 across sfs; a wrongly computed
    * signature breaks both long before 0.2). */
  private def minhashEstGuarded: String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
       |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
       |       FROM toks WHERE len(t) >= 3),
       |g AS (${Golden.dispatch("dedup_minhash_lsh")})
       |SELECT g.doc_a, g.doc_b,
       |  CASE WHEN abs(g.est_jaccard * 32 - round(g.est_jaccard * 32)) < 0.01
       |        AND abs(g.est_jaccard - len(list_intersect(a.sh, b.sh)) * 1.0 /
       |                               len(list_distinct(a.sh || b.sh))) <= 0.2
       |       THEN g.est_jaccard ELSE -1 END AS est_jaccard
       |FROM g JOIN sh a ON g.doc_a = a.doc_id JOIN sh b ON g.doc_b = b.doc_id
       |ORDER BY g.__row""".stripMargin

  /** Completeness-anchored twin for the per-doc signatures: the 64-bit
    * values are Spark-xxhash64-derived and not recomputable in DuckDB
    * (SURVEY §8 holdout note), but anchoring from the documents table
    * proves every document got exactly one signature — a golden missing
    * or duplicating a doc yields a NULL/extra row and hash-mismatches.
    * Pair-level arithmetic over these signatures is independently checked
    * by [[hammingRecomputed]]. */
  private def simhashDocsAnchored: String =
    s"""WITH g AS (${Golden.dispatch("dedup_simhash_docs")})
       |SELECT d.doc_id, g.simhash
       |FROM documents d LEFT JOIN g ON d.doc_id = g.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Cross-SOURCE duplication matrix: exact 3-gram-shingle Jaccard
    * between every source pair — the corpus-curation readout that finds
    * mirrored/scraped-twice upstreams BEFORE per-document dedup spends
    * effort on them (two sources with jaccard ≈ 1 should be dropped at
    * the manifest, not deduplicated document by document).
    *
    * Scale note — why this self-join is safe when the per-DOC
    * shingle-index join (header warning above) is not: shingles are
    * first collapsed to DISTINCT (source, shingle) pairs, so a shingle
    * can appear at most once per source and contributes at most
    * C(|sources|, 2) join pairs no matter how hot it is in the corpus;
    * with a bounded source catalog the join output is ≤ |distinct
    * shingles|·C(|S|,2), linear in vocabulary. Per-source set sizes and
    * intersections are exact int64; Jaccard quantizes through the
    * decimal idiom. Pairs sharing zero shingles are absent by
    * construction (their Jaccard is 0). */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // widened: shingling cost, single-task on a one-row-group scan
    // (guide §2.5); downstream counts are exact.
    //
    // ONE shuffle of the shingle relation for the pair counts instead of
    // three (§2.3/§2.4): the round-15 shape ran distinct over (source,
    // shingle) STRINGS and then self-joined that relation on the shingle
    // string (the distinct exchange + BOTH self-join exchanges carried
    // full shingle text). Two changes:
    //  - shingles are HASHED to int64 before any exchange (§2.3 shuffle
    //    fewer bytes; counts are hash-collision-exact below ~10⁹ distinct
    //    shingles, and the deterministic corpora verify against the
    //    string-based oracle);
    //  - the per-shingle SOURCE SET is bounded by the source catalog
    //    (|S| sources, dozens — never corpus-sized), so one groupBy(sh)
    //    with collect_set(source) replaces distinct + self-join: pairs
    //    explode map-side from the ≤|S| set.
    // Per-source distinct counts come from an INDEPENDENT count_distinct
    // subtree over the same exploded relation, not from a cached `sets`:
    // a round-16a variant persisted sets for both consumers and the
    // cache barrier cost ~2× (1.17 s → 2.14 s cold at sf0.1).
    val shingled = Tables.widened(Tables.documents(s, d))
      .select($"source", split($"text", " ").as("__w"))
      .filter(size($"__w") >= 3)
      .select($"source", explode(expr(ShingleExpr)).as("sh0"))
      .select($"source", xxhash64($"sh0").as("sh"))
    val per = shingled.groupBy($"source")
      .agg(count_distinct($"sh").as("n"))
    shingled
      .groupBy($"sh").agg(collect_set($"source").as("ss"))
      .filter(size($"ss") >= 2)
      .select(explode($"ss").as("s1"), $"ss")
      .select($"s1", explode($"ss").as("s2"))
      .filter($"s1" < $"s2")
      .groupBy($"s1", $"s2")
      .agg(count(lit(1)).as("common"))
      .join(broadcast(per.select($"source".as("s1"), $"n".as("n1"))), Seq("s1"))
      .join(broadcast(per.select($"source".as("s2"), $"n".as("n2"))), Seq("s2"))
      .select($"s1", $"s2", $"common", $"n1", $"n2",
        round(($"common".cast("double") / ($"n1" + $"n2" - $"common").cast("double"))
          .cast("decimal(28,8)"), 6).cast("double").as("jaccard"))
      .orderBy($"s1", $"s2")
  }

  val sourceOverlapOracle: String =
    """WITH toks AS (SELECT source, string_split(text, ' ') AS t FROM documents),
      |sh0 AS (SELECT source, unnest(list_transform(range(1, len(t) - 1),
      |          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
      |        FROM toks WHERE len(t) >= 3),
      |sh AS (SELECT DISTINCT source, sh FROM sh0),
      |per AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS s1, b.source AS s2, count(*) AS common
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT s1, s2, CAST(common AS BIGINT) AS common,
      |       CAST(pa.n AS BIGINT) AS n1, CAST(pb.n AS BIGINT) AS n2,
      |       CAST(round(CAST(CAST(common AS DOUBLE)
      |                       / CAST(pa.n + pb.n - common AS DOUBLE)
      |                  AS DECIMAL(28,8)), 6) AS DOUBLE) AS jaccard
      |FROM pairs JOIN per pa ON s1 = pa.source JOIN per pb ON s2 = pb.source
      |ORDER BY s1, s2""".stripMargin

  // -------------------------------------------------------------------
  // Exact set-similarity join with prefix filtering (AllPairs/PPJoin)
  // -------------------------------------------------------------------

  /** Prefix-filtered EXACT set-similarity self-join (Bayardo, Ma &
    * Srikant, "Scaling Up All Pairs Similarity Search", WWW 2007; the
    * PPJoin family) — the deterministic exact counterpart of the MinHash
    * path: every document pair with shingle-set Jaccard ≥ t, with EXACT
    * intersection counts, no hashing, no recall loss.
    *
    * Prefix-filtering theorem: order every doc's shingles by global
    * rarity (df asc, shingle asc); if J(A,B) ≥ t then A and B must share
    * a shingle within each other's first |s| − ⌈t·|s|⌉ + 1 shingles — so
    * candidate pairs are generated ONLY from the tiny rare-first prefix
    * inverted index, never all-pairs. The length filter (t·|a| ≤ |b| ≤
    * |a|/t, a necessary condition for J ≥ t) prunes further. Measured on
    * the sf corpora: 430k candidate token-pairs at sf0.1 vs 12.5M brute
    * pairs (29×), and the candidate volume scales with true-similar
    * density, not n² — rare-first prefixes keep frequent shingles out of
    * the index.
    *
    * Scale shape: one distinct-shingle shuffle, one bounded per-doc
    * window (partitioned by doc, ≤|set| rows each) for the rarity ranks,
    * the prefix self-join, then intersection counting confined to
    * candidate pairs (cand ⋈ tokens(a) ⋈ tokens(b) — cost ∝ Σ|cand|·|doc|,
    * never the inverted-index self-join Σdf²). The t = 1/2 acceptance
    * test and the reported similarity are exact integers (3·∩ ≥ |A|+|B|;
    * jaccard_e6 integer-divided), so both engines agree bit-for-bit —
    * the oracle re-derives the ENTIRE pipeline in SQL with no goldens,
    * and SetSimJoinSpec proves completeness against an all-pairs brute
    * force. */
  def setSimilarityJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // widened: shingling cost, single-task on a one-row-group scan
    // (guide §2.5); the PPJoin pipeline downstream is exact integers.
    //
    // Tokens are 64-bit shingle hashes, not 3-gram STRINGS (§2.3 shuffle
    // fewer bytes): this relation feeds five aggregation/join subtrees
    // (sizes, dfq, ranked, both intersection re-attachments) and every
    // one of their exchanges previously carried full shingle text.
    // PPJoin is complete under ANY consistent total token order
    // (Xiao et al. WWW 2008 — the canonical df-ascending order is a
    // pruning heuristic, ties broken arbitrarily), and the output
    // columns are counts, so the result set is IDENTICAL under hashing
    // (SetSimJoinSpec re-proves completeness against brute force; the
    // string-based oracle matches because both sides emit the same
    // surviving pairs). 64-bit collisions: ~n²/2⁶⁵ — immaterial below
    // ~10⁹ distinct shingles; shard the hash space past that.
    // A round-16a variant persisted the STRING relation instead:
    // 4.8 s → 11.9 s cold — the cache barrier serialized five subtrees
    // that recompute in full parallelism inside one job.
    val tok = Tables.widened(Tables.documents(s, d))
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        """transform(sequence(0, greatest(size(ws) - 3, 0)),
          |          i -> xxhash64(concat_ws(' ', slice(ws, i + 1, 3))))""".stripMargin))
        .as("sh"))
      .distinct()
    // df and n as WINDOW counts over the two partitionings — TWO
    // exchanges of tok (by sh, then by doc_id; n and rn share one
    // sorted window) instead of the aggregate+join spelling's four
    // (dfq agg, df join, sizes agg, sizes join) — guide §2.4; counts
    // over a window partition equal the groupBy counts row-for-row.
    // This subtree is evaluated on BOTH sides of the prefix self-join,
    // so the saving lands twice (measured 2.2 → 1.5 s per evaluation).
    val wDocOrd = Window.partitionBy($"doc_id").orderBy($"df", $"sh")
    val ranked = tok
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"sh")))
      .withColumn("n", count(lit(1)).over(
        wDocOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wDocOrd))
      // prefix length for t = 1/2: n − ⌈n/2⌉ + 1, exact integers
      .filter($"rn" <= $"n" - (($"n" + 1) / 2).cast("long") + 1)
      .select($"doc_id", $"sh", $"n", $"rn")
    // POSITIONAL filter (the PPJoin tightening of AllPairs, Xiao et al.
    // WWW 2008): a shared prefix token at rarity positions (i, j) bounds
    // the overlap by min(i,j) − 1 (tokens before it) + 1 (itself) +
    // min(|A|−i, |B|−j) (tokens after it); J ≥ 1/2 needs overlap ≥
    // ⌈(|A|+|B|)/3⌉, so a pair whose TIGHTEST witness bound falls short
    // is pruned before any intersection counting. Exact integers.
    val cand = ranked.select($"doc_id".as("doc_a"), $"sh",
        $"n".as("n_a"), $"rn".as("ra"))
      .join(ranked.select($"doc_id".as("doc_b"), $"sh",
        $"n".as("n_b"), $"rn".as("rb")), "sh")
      .filter($"doc_a" < $"doc_b")
      // length filter: J ≥ 1/2 requires |a|/2 ≤ |b| ≤ 2|a|
      .filter($"n_b" * 2 >= $"n_a" && $"n_a" * 2 >= $"n_b")
      .withColumn("ub", least($"ra", $"rb") +
        least($"n_a" - $"ra", $"n_b" - $"rb"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(min($"ub").as("ub"))
      .filter($"ub" * 3 >= $"n_a" + $"n_b")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b")
    val inter = cand
      .join(tok.select($"doc_id".as("doc_a"), $"sh"), "doc_a")
      .join(tok.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(count(lit(1)).as("n_inter"))
    inter
      .filter($"n_inter" * 3 >= $"n_a" + $"n_b") // J ≥ 1/2, exact
      .select($"doc_a", $"doc_b", $"n_a", $"n_b", $"n_inter",
        expr("(1000000 * n_inter) div (n_a + n_b - n_inter)").as("jaccard_e6"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** Fully-recomputed oracle: DuckDB re-runs the same prefix-filtered
    * pipeline (shingling, rarity ranks, prefix join, length filter,
    * exact intersection, integer acceptance) from the raw documents
    * table — no goldens anywhere. */
  val setSimilarityJoinOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, ws,
      |             unnest(generate_series(0, greatest(len(ws) - 3, 0))) AS i
      |      FROM w),
      |tok AS (SELECT DISTINCT doc_id,
      |               array_to_string(ws[i + 1 : i + 3], ' ') AS sh
      |        FROM g),
      |sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
      |dfq AS (SELECT sh, count(*) AS df FROM tok GROUP BY 1),
      |ranked AS (
      |  SELECT t.doc_id, t.sh, s.n,
      |         row_number() OVER (PARTITION BY t.doc_id
      |                            ORDER BY d.df, t.sh) AS rn
      |  FROM tok t JOIN dfq d USING (sh) JOIN sizes s USING (doc_id)),
      |pref AS (SELECT doc_id, sh, n, rn FROM ranked
      |         WHERE rn <= n - ((n + 1) // 2) + 1),
      |cand AS (SELECT doc_a, doc_b, n_a, n_b FROM (
      |           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |                  a.n AS n_a, b.n AS n_b,
      |                  min(least(a.rn, b.rn)
      |                      + least(a.n - a.rn, b.n - b.rn)) AS ub
      |           FROM pref a JOIN pref b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |           WHERE b.n * 2 >= a.n AND a.n * 2 >= b.n
      |           GROUP BY 1, 2, 3, 4)
      |         WHERE ub * 3 >= n_a + n_b),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, c.n_a, c.n_b, count(*) AS n_inter
      |  FROM cand c
      |       JOIN tok ta ON ta.doc_id = c.doc_a
      |       JOIN tok tb ON tb.doc_id = c.doc_b AND tb.sh = ta.sh
      |  GROUP BY 1, 2, 3, 4)
      |SELECT doc_a, doc_b, CAST(n_a AS BIGINT) AS n_a,
      |       CAST(n_b AS BIGINT) AS n_b, CAST(n_inter AS BIGINT) AS n_inter,
      |       CAST((1000000 * n_inter) // (n_a + n_b - n_inter) AS BIGINT)
      |         AS jaccard_e6
      |FROM inter WHERE n_inter * 3 >= n_a + n_b
      |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // End-to-end curation composite (round-12 verdict "Next round" #7c)
  // -------------------------------------------------------------------

  /** The full dedup pipeline a 100 TB curation run actually executes —
    * exact → near-dup keep-best → semantic — as ONE query whose output is
    * the per-stage row-attrition readout (stage, n_in, n_dropped, n_out),
    * each stage consuming the PREVIOUS stage's survivors:
    *
    *  1. exact: one fingerprint shuffle, keep min doc_id per distinct
    *     text ([[exactDedup]]'s rule);
    *  2. near_dup: the corpus's MinHash-LSH→Jaccard→CC cluster mapping
    *     ([[nearDupClusters]] — the SAME shared artifact the standalone
    *     queries serve), restricted to survivors; within each cluster
    *     elect the keep-best representative ([[keepBestClusters]]'s
    *     longest-doc policy, n_chars desc / doc_id asc) and drop the
    *     rest;
    *  3. semantic: SemDeDup over the survivors' embeddings
    *     ([[Similarity.semDedupOf]], cell-confined cosine ≥ 0.95), keep
    *     the min-id member per semantic cluster. Docs without an
    *     embedding row pass through untouched (at sf0.1 only 2 000 of
    *     5 000 docs are embedded — the composite documents, not hides,
    *     partial embedding coverage).
    *
    * Ground truth is PLANTED per the house convention (plantedSemDedup /
    * sim_embedding_clusters — the raw corpus has no exact and no true
    * semantic dups, so stages 1 and 3 would be vacuously green):
    * every 25th doc gets an exact twin at doc_id+1e6 (same text) and
    * every 50th an embedding-identical semantic twin at doc_id+2e6 with
    * a unique text ("sem twin <id>") that stages 1-2 cannot drop.
    *
    * Scale shape: stage 1 is one hash shuffle; stage 2 reuses the shared
    * pair-evidence artifact (banded LSH, never all-pairs) plus a
    * cluster-partitioned window over cluster members only; stage 3 is
    * cell-confined pairwise cosine over survivors. In production each
    * stage MATERIALIZES its survivor set (the readout here keeps the
    * counts; survivor frames are persisted across their two uses and
    * released). The oracle recomputes every count in DuckDB from the raw
    * documents/embeddings tables plus the EXISTING dedup_cluster_docs
    * golden — stage chaining (n_in(k+1) = n_out(k)), the exact-survivor
    * rule, the keep-best election, and the planted-semantic drop are all
    * re-derived independently; no new golden. */
  def dedupPipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the readout is itself a build-once artifact: the pipeline's cost is
    // its stages, so a warm serve must be a FileScan of the 3-row result,
    // not a re-run (ArtifactServeSpec gates this for the whole family)
    SessionCaches.parquetArtifact(s, s"doc-dedup-pipeline:$d") { outDir =>
      dedupPipelineRows(s, d).coalesce(1)
        .write.mode("overwrite").parquet(outDir)
    }.orderBy($"stage_idx")
  }

  private def dedupPipelineRows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d).select($"doc_id", $"text", $"n_chars")
    val exactTwins = docs.filter($"doc_id" % 25 === 0)
      .select(($"doc_id" + 1000000L).as("doc_id"), $"text", $"n_chars")
    val semTwinDocs = docs.filter($"doc_id" % 50 === 0)
      .select(($"doc_id" + 2000000L).as("doc_id"),
        concat(lit("sem twin "), $"doc_id".cast("string")).as("text"))
      .withColumn("n_chars", length($"text").cast("long"))
    val corpus0 = docs.unionByName(exactTwins).unionByName(semTwinDocs)

    // stage 1 — exact: fingerprint shuffle, min-id election per text
    val surv1 = corpus0
      .select($"doc_id", md5($"text".cast("binary")).as("fp"), $"n_chars")
      .groupBy($"fp")
      .agg(min($"doc_id").as("doc_id"), min($"n_chars").as("n_chars"))
      .persist()

    // Overlap the two stage-independent long poles with stage 1 (guide
    // §2.6): the near-dup cluster artifact (stage 2's input) and the
    // semantic quantizer (stage 3's model) depend only on the base
    // tables, so they build on a small pool WHILE stage 1's fingerprint
    // election materializes on this thread (the explicit surv1.count —
    // without it nothing triggers stage 1 before the await and the
    // futures only overlapped each other; round-15 ADVICE). Everything
    // from pool creation through the await is one try/finally so a
    // failing stage-1 job cannot leak the non-daemon pool. dirMemo/
    // modelMemo serialize per key, so the sequential calls below serve
    // what the futures built.
    {
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      try {
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        val warmF = Future(nearDupClusters(s, d).count())
          .zip(Future(Similarity.kmeansCentroids(s, d)))
        surv1.count() // stage 1 runs now, overlapping the warm builds
        Await.result(warmF, Duration.Inf)
      } finally pool.shutdown()
    }

    // stage 2 — near-dup keep-best over the shared cluster artifact,
    // restricted to stage-1 survivors (planted ids are never members)
    val members = nearDupClusters(s, d).select($"doc_id", $"cluster_id")
      .join(surv1.select($"doc_id", $"n_chars"), "doc_id")
    val w = Window.partitionBy($"cluster_id").orderBy($"n_chars".desc, $"doc_id")
    val dropped2 = members
      .withColumn("rn", row_number().over(w)).filter($"rn" > 1)
      .select($"doc_id")
    val surv2 = surv1.select($"doc_id")
      .join(dropped2, Seq("doc_id"), "left_anti").persist()

    // stage 3 — SemDeDup over the survivors that HAVE embeddings; the
    // planted twin carries its source's exact embedding (same cell, cos 1)
    val embBase = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val twinEmb = embBase.filter($"vec_id" % 50 === 0)
      .select(($"vec_id" + 2000000L).as("vec_id"), $"embedding")
    val embSet = embBase.unionByName(twinEmb)
      .join(surv2.select($"doc_id".as("vec_id")), "vec_id")
    val dropped3 = Similarity.semDedupOf(s, d, embSet)
      .filter($"keep" === 0).select($"vec_id".as("doc_id"))
    val surv3 = surv2.join(dropped3, Seq("doc_id"), "left_anti")

    val n0 = corpus0.count()
    val n1 = surv1.count()
    val n2 = surv2.count()
    val n3 = surv3.count()
    surv1.unpersist(blocking = false)
    surv2.unpersist(blocking = false)
    Seq(
      (1, "exact", n0, n0 - n1, n1),
      (2, "near_dup", n1, n1 - n2, n2),
      (3, "semantic", n2, n2 - n3, n3))
      .toDF("stage_idx", "stage", "n_in", "n_dropped", "n_out")
      .orderBy($"stage_idx")
  }

  /** Fully-recomputed oracle for [[dedupPipeline]]: DuckDB re-derives the
    * planted corpus, the exact-survivor rule, the keep-best election over
    * the committed dedup_cluster_docs golden, and the planted-semantic
    * drop (a twin falls iff its source survived stage 2 AND is embedded —
    * the only semantic pairs that exist, pinned by sim_semdedup across
    * all SFs). Every count and the chaining law are independent. */
  private def dedupPipelineOracle: String =
    s"""WITH gc AS (${Golden.dispatch("dedup_cluster_docs")}),
       |docs AS (SELECT doc_id, text, n_chars FROM documents),
       |corpus0 AS (
       |  SELECT doc_id, text FROM docs
       |  UNION ALL
       |  SELECT doc_id + 1000000, text FROM docs WHERE doc_id % 25 = 0
       |  UNION ALL
       |  SELECT doc_id + 2000000, 'sem twin ' || CAST(doc_id AS VARCHAR)
       |  FROM docs WHERE doc_id % 50 = 0),
       |s1 AS (SELECT min(doc_id) AS doc_id FROM corpus0 GROUP BY text),
       |m AS (SELECT gc.doc_id, gc.cluster_id, d.n_chars
       |      FROM gc JOIN s1 USING (doc_id) JOIN docs d USING (doc_id)),
       |drop2 AS (SELECT doc_id FROM (
       |    SELECT doc_id, row_number() OVER (
       |      PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id) AS rn
       |    FROM m) WHERE rn > 1),
       |s2 AS (SELECT doc_id FROM s1
       |       WHERE doc_id NOT IN (SELECT doc_id FROM drop2)),
       |drop3 AS (SELECT doc_id + 2000000 AS doc_id FROM docs
       |          WHERE doc_id % 50 = 0
       |            AND doc_id IN (SELECT doc_id FROM s2)
       |            AND doc_id IN (SELECT vec_id FROM embeddings)),
       |c AS (SELECT (SELECT count(*) FROM corpus0) AS n0,
       |             (SELECT count(*) FROM s1) AS n1,
       |             (SELECT count(*) FROM drop2) AS d2,
       |             (SELECT count(*) FROM drop3) AS d3)
       |SELECT * FROM (
       |  SELECT 1 AS stage_idx, 'exact' AS stage,
       |         n0 AS n_in, n0 - n1 AS n_dropped, n1 AS n_out FROM c
       |  UNION ALL
       |  SELECT 2, 'near_dup', n1, d2, n1 - d2 FROM c
       |  UNION ALL
       |  SELECT 3, 'semantic', n1 - d2, d3, n1 - d2 - d3 FROM c
       |) ORDER BY stage_idx""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("join_set_similarity", Some(setSimilarityJoinOracle), setSimilarityJoin),
    Q("doc_dedup_pipeline", Some(dedupPipelineOracle), dedupPipeline),
    Q("corpus_source_overlap", Some(sourceOverlapOracle), sourceOverlap),
    Q("dedup_exact", Some(exactDedupOracle), exactDedup),
    Q("dedup_incremental_batch", Some(incrementalDedupOracle), incrementalDedup),
    Q("dedup_minhash_incremental", Some(incrementalMinhashTwin), (s, d) => incrementalMinhashDedup(s, d)),
    Q("dedup_keep_best", Some(keepBestRecomputed), keepBestClusters),
    Q("dedup_exact_by_hash", Some(exactDedupByHashOracle), exactDedupByHash),
    Q("dedup_ngram_jaccard", Some(jaccardRecomputed), ngramJaccardPairs),
    Q("dedup_simhash_docs", Some(simhashDocsAnchored), simhashDocs),
    Q("dedup_simhash_pairs", Some(hammingRecomputed), simhashPairs),
    Q("dedup_minhash_lsh", Some(minhashEstGuarded), minhashLshPairs),
    Q("dedup_cluster_docs", Some(clusterStructureOracle("dedup_cluster_docs")), (s, d) => nearDupClusters(s, d)),
    // refresh ≡ rebuild exactly, so the incremental path is gated against
    // the FULL-REBUILD golden — divergence between the two paths is a
    // hard correctness failure, not a soft rows-only check
    Q("dedup_cluster_incremental", Some(clusterStructureOracle("dedup_cluster_docs")), (s, d) => incrementalClusterRefresh(s, d)),
    Q("dedup_simhash_clusters", Some(clusterStructureOracle("dedup_simhash_clusters")), (s, d) => simhashClusters(s, d)))
}
