package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over `documents`: exact (hash-groupBy), n-gram
  * Jaccard near-dup, SimHash, MinHash-LSH. Core training-data-pipeline
  * surface (builder brief); the reference has no dedup at all.
  *
  * Scale posture (100 TB corpus):
  *  - exact dedup is one shuffle on the content hash (group on md5, not the
  *    full text, so shuffle rows are 32 bytes + ids, not documents);
  *  - near-dup avoids the O(n²) pair space by inverted-index / LSH banding:
  *    candidate pairs only form inside a shared shingle or band bucket;
  *  - stop-shingles (document frequency above a cap) are dropped before the
  *    self-join — the classic skew guard, otherwise one hot shingle creates
  *    a quadratic bucket;
  *  - SimHash is computed per-document with higher-order array functions
  *    (narrow map, no shuffle), then banded for the pair join.
  */
object Dedup {

  /** Exact dedup: keep the lowest doc_id per identical text. Grouping on the
    * md5 fingerprint keeps the shuffle narrow at scale; text is re-attached
    * by the min-id row semantics (here: group directly on text — oracle
    * equality needs the text column, and the synthetic corpus is small; the
    * fingerprint variant is `text_fingerprint`). */
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

  /** Distinct 3-gram word shingles per doc (docs with <3 tokens dropped). */
  private[operators] def shingles(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .filter(size(split($"text", " ")) >= 3)
      .select($"doc_id",
        explode(array_distinct(expr(
          """transform(sequence(0, size(split(text, ' ')) - 3),
            |          i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"""
            .stripMargin))).as("shingle"))
  }

  /** n-gram Jaccard near-dup: inverted index on shingles → candidate pairs
    * only where a shingle is shared → Jaccard from intersection/set sizes.
    * Top-20 most similar pairs (rows-only check; set algebra over shingle
    * strings has no portable SQL oracle). */
  def ngramJaccardPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, d).cache()
    // Skew guard: drop stop-shingles appearing in >5% of docs (quadratic
    // bucket risk at scale); synthetic corpus keeps most shingles rare.
    val nDocs = Tables.documents(s, d).count()
    val cap = math.max(50L, nDocs / 20)
    val rare = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" <= cap).select($"shingle")
    val filtered = sh.join(broadcast(rare), Seq("shingle"))
    val sizes = filtered.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val a = filtered.select($"doc_id".as("doc_a"), $"shingle")
    val b = filtered.select($"doc_id".as("doc_b"), $"shingle")
    val common = a.join(b, Seq("shingle"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"common".cast("double") / ($"n_a" + $"n_b" - $"common"), 4).as("jaccard"))
      .orderBy($"jaccard".desc, $"doc_a", $"doc_b")
      .limit(20)
  }

  /** 64-bit SimHash per document, computed entirely with higher-order array
    * expressions (no UDF, no explode — a narrow map even at 100 TB):
    * bit i of the hash is the sign of Σ_tokens (bit i of xxhash64(token) ? +1 : -1). */
  private[operators] def withSimhash(df: DataFrame): DataFrame =
    df.withColumn("toks", array_distinct(split(col("text"), " ")))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 63), cast(0 as bigint), (acc, i) ->
          |  acc + IF(aggregate(toks, 0, (c, t) ->
          |             c + IF((shiftright(xxhash64(t), i) & 1) = 1, 1, -1)) > 0,
          |           shiftleft(cast(1 as bigint), i), cast(0 as bigint)))"""
          .stripMargin))
      .drop("toks")

  /** SimHash near-dup: banded candidate generation (4 × 16-bit bands — two
    * docs within Hamming distance 3 of 64 bits must agree on ≥1 band), then
    * exact Hamming check via bit_count(xor). Rows-only check. */
  def simhashPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashed = withSimhash(Tables.documents(s, d))
      .select($"doc_id", $"simhash").cache()
    val banded = hashed.select($"doc_id", $"simhash",
      explode(expr(
        """transform(sequence(0, 3),
          |          b -> named_struct('band', b,
          |                            'key', shiftright(simhash, b * 16) & 65535))"""
          .stripMargin)).as("bk"))
      .select($"doc_id", $"simhash", $"bk.band", $"bk.key")
    val a = banded.select($"band", $"key", $"doc_id".as("doc_a"), $"simhash".as("sh_a"))
    val b = banded.select($"band", $"key", $"doc_id".as("doc_b"), $"simhash".as("sh_b"))
    a.join(b, Seq("band", "key"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        expr("bit_count(sh_a ^ sh_b)").cast("int").as("hamming"))
      .distinct()
      .filter($"hamming" <= 16)
      .orderBy($"hamming", $"doc_a", $"doc_b")
      .limit(50)
  }

  /** Per-document SimHash values (rows-only; deterministic). */
  def simhashDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    withSimhash(Tables.documents(s, d))
      .select($"doc_id", $"simhash")
      .orderBy($"doc_id")
  }

  /** MinHash signatures without spark.ml: k=16 independent permutations
    * approximated by min over xxhash64(shingle, seed_k) — the standard
    * MinHash construction, expressed as one aggregation over the shingle
    * inverted index (one shuffle on doc_id). Banding (pairs agreeing on a
    * 4-hash band) yields LSH candidates; output is candidate pairs with
    * estimated Jaccard = matching minhashes / 16. Rows-only check. */
  def minhashLshPairs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sh = shingles(s, d)
    // 16 hash functions: xxhash64 salted by k via concat — min per (doc, k).
    val sigs = sh.select($"doc_id",
        explode(expr(
          """transform(sequence(0, 15),
            |          k -> named_struct('k', k,
            |                            'h', xxhash64(shingle, k)))""".stripMargin)).as("kh"))
      .groupBy($"doc_id", $"kh.k")
      .agg(min($"kh.h").as("mh"))
      .groupBy($"doc_id")
      .agg(array_sort(collect_list(struct($"k", $"mh"))).as("sig_kv"))
      .select($"doc_id", expr("transform(sig_kv, x -> x.mh)").as("sig"))
      .cache()
    // LSH banding: 4 bands × 4 rows; candidates share ≥1 full band.
    val banded = sigs.select($"doc_id", $"sig",
        explode(expr(
          """transform(sequence(0, 3),
            |          b -> named_struct('band', b, 'key', xxhash64(slice(sig, b * 4 + 1, 4))))"""
            .stripMargin)).as("bk"))
      .select($"doc_id", $"sig", $"bk.band", $"bk.key")
    val a = banded.select($"band", $"key", $"doc_id".as("doc_a"), $"sig".as("sig_a"))
    val b = banded.select($"band", $"key", $"doc_id".as("doc_b"), $"sig".as("sig_b"))
    a.join(b, Seq("band", "key"))
      .filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        round(expr(
          "size(filter(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), v -> v = 1)) / 16.0"
        ), 4).as("est_jaccard"))
      .distinct()
      .orderBy($"est_jaccard".desc, $"doc_a", $"doc_b")
      .limit(50)
  }

  val defs: Seq[Q] = Seq(
    Q("dedup_exact", Some(exactDedupOracle), exactDedup),
    Q("dedup_ngram_jaccard", None, ngramJaccardPairs),
    Q("dedup_simhash_docs", None, simhashDocs),
    Q("dedup_simhash_pairs", None, simhashPairs),
    Q("dedup_minhash_lsh", None, minhashLshPairs))
}
