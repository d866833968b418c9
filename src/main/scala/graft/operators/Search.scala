package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Full-text retrieval over the documents table: an inverted index
  * (postings of per-document term frequencies) and BM25 top-k scoring
  * against it, plus corpus-wide n-gram frequency mining.
  *
  * Nothing like this exists in the reference (SURVEY.md §2.8 — its only
  * text artifact is the event_type enum); these are the retrieval legs a
  * training-data pipeline needs: BM25 is how you pull topical slices out
  * of a 100 TB corpus ("give me the docs about X for targeted evals"),
  * and top n-grams is the boilerplate detector that feeds stop-lists.
  *
  * Scale shape:
  *  - The inverted index is ONE shuffle keyed on (term) after a narrow
  *    explode — term keys are near-uniform by Zipf-tail mass, and the
  *    per-(doc,term) pre-aggregation is map-side combinable.
  *  - A query touches only its own terms' postings: the tf relation is
  *    filtered to the query's terms BEFORE the aggregation, so the
  *    shuffled volume is O(postings of the query terms), not O(corpus).
  *  - Corpus statistics (N, avgdl) are two bounded driver scalars — the
  *    same pattern as [[CorpusDedup.unigramSurpriseStats]]; df joins on
  *    the terms key (a handful of rows, AQE-broadcast).
  *  - Final ranking is orderBy+limit → TakeOrderedAndProject; the driver
  *    only ever sees k rows.
  */
object Search {

  /** BM25 parameters — conventional defaults, inlined as literals in the
    * oracle SQL so both engines evaluate the same textual formula. */
  private val K1 = 1.2
  private val B  = 0.75

  /** Deterministic example query over the synthetic corpus vocabulary. */
  private[operators] val QueryTerms = Seq("hash", "vector", "stream")

  /** Per-(doc_id, term) term frequencies restricted to `terms` — the
    * postings slice a query actually reads. Narrow explode + filter, one
    * map-side-combinable aggregation keyed on (doc_id, term). */
  private[operators] def postingsFor(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** BM25 top-k: score every document holding at least one query term by
    * sum over query terms of
    * `ln((N - df + 0.5)/(df + 0.5) + 1) * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`.
    *
    * Per-term contributions are quantized to DECIMAL(28,8) and summed in
    * exact decimal (the [[CorpusDedup.unigramSurpriseStats]] idiom) so the
    * 4-dp round can never flip on cross-engine double-summation order.
    * N and avgdl are exact-integer-derived driver scalars, so both
    * engines see bit-identical constants. */
  def bm25TopK(s: SparkSession, d: String,
               terms: Seq[String] = QueryTerms, k: Int = 20): DataFrame =
    bm25TopKOf(Tables.documents(s, d), terms, k)

  def bm25TopKOf(docs: DataFrame,
                 terms: Seq[String] = QueryTerms, k: Int = 20,
                 stats: Option[(Long, Long)] = None): DataFrame = {
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    // Two bounded scalars (a Long and a Long/Long quotient), not a
    // constant-key join: sum and count are exact in Long, so the double
    // quotient is bit-identical to DuckDB's sum(dl)*1.0/count(*).
    // Callers issuing MANY queries over one corpus (Rag.ndcgEvalOf's eval
    // set) pass the pair once instead of re-running the action per query.
    val (dlSum, nDocs) = stats.getOrElse {
      val r = dl.agg(sum(col("dl")).cast("long"), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    val avgdl = dlSum.toDouble / nDocs.toDouble
    val tf = postingsFor(docs, terms)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))
    val contrib = idf * (col("tf") * lit(K1 + 1.0)) / norm
    tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .groupBy(col("doc_id"))
      .agg(round(sum(contrib.cast("decimal(28,8)")).cast("double"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** The (Σdl, n_docs) pair [[bm25TopKOf]] needs — exposed so multi-query
    * callers compute it once. */
  def corpusStats(docs: DataFrame): (Long, Long) = {
    val r = docs.select(size(split(col("text"), " ")).as("dl"))
      .agg(sum(col("dl")).cast("long"), count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def termListSql = QueryTerms.map(t => s"'$t'").mkString(", ")

  val bm25TopKOracle: String =
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
       |st AS (SELECT sum(dl) * 1.0 / count(*) AS avgdl, count(*) * 1.0 AS n FROM dl),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |       WHERE term IN ($termListSql) GROUP BY 1, 2),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT tf.doc_id,
       |              CAST(sum(CAST(ln((n - df + 0.5) / (df + 0.5) + 1.0)
       |                            * (tf * ${K1 + 1.0}) / (tf + $K1 * (${1.0 - B} + $B * dl / avgdl))
       |                       AS DECIMAL(28,8))) AS DOUBLE) AS s
       |       FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       |       GROUP BY 1)
       |SELECT doc_id, CAST(round(s, 4) AS DOUBLE) AS bm25
       |FROM sc ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin

  /** Index-build memo: the full inverted index is materialized once per
    * (session, corpus) via [[SessionCaches]] (the [[Similarity]] index
    * idiom). */

  /** Number of term-hash partitions of the postings index. */
  private[operators] val TermBuckets = 32

  /** One-time inverted-index build: the COMPLETE postings list
    * (doc_id, term, tf, dl — dl denormalized onto every posting, the
    * Lucene norm idiom) partitioned on a 32-way term-hash bucket, plus a
    * one-row corpus-stats file (N, Σdl).
    *
    * This is the materialized half of the production layout: build once
    * per corpus snapshot, query many times. Partitioning by a hash of the
    * TERM means a query only lists/reads the partitions its own terms
    * hash into — a partition-pruned scan of ~|terms|/32 of the index
    * instead of re-tokenizing 100 TB of raw text per query (which is what
    * [[bm25TopK]] does, and why it is the from-scratch baseline). */
  /** Tokenize `docs` into postings rows and write them into
    * `$root/postings` — shared by the one-time build and the incremental
    * refresh so the two paths cannot drift. Returns the (Σdl, n_docs)
    * pair of exact-integer corpus stats for the written docs. */
  private def writePostings(docs: DataFrame, root: String, mode: String): (Long, Long) = {
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(dl, "doc_id")
      .withColumn("bucket", pmod(crc32(col("term")), lit(TermBuckets)).cast("int"))
      .write.mode(mode).partitionBy("bucket").parquet(s"$root/postings")
    val r = dl.agg(sum(col("dl")).cast("long"), count(lit(1))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def writeStats(s: SparkSession, root: String, dlSum: Long, nDocs: Long): Unit = {
    import s.implicits._
    Seq((dlSum, nDocs)).toDF("dl_sum", "n_docs")
      .write.mode("overwrite").parquet(s"$root/stats")
  }

  private[operators] def postingsIndexDir(s: SparkSession, d: String): String =
    SessionCaches.dirMemo(s, s"bm25-postings:$d") { path =>
      val (dlSum, nDocs) = writePostings(Tables.documents(s, d), path, "overwrite")
      writeStats(s, path, dlSum, nDocs)
    }

  /** Incremental postings refresh (round-7 verdict "Next round" #4): the
    * new docs' postings APPEND into the term-hash partitions (a posting
    * row is per (doc_id, term) — disjoint from every existing doc's rows,
    * so append ≡ full rebuild exactly), and the one-row corpus stats
    * accumulate in exact integer arithmetic (old Σdl + delta Σdl is the
    * same Long the full recompute produces). Cost ∝ |delta|; pre-existing
    * postings files are left byte-identical (IndexRefreshSpec asserts).
    * Durable indexes re-home to the grown corpus's content address, the
    * refreshManifest lifecycle. Returns the index dir to use from now on. */
  def refreshPostingsIndex(s: SparkSession, d: String, newDocs: DataFrame): String = {
    val root = postingsIndexDir(s, d)
    val st = s.read.parquet(s"$root/stats").head()
    val (oldDl, oldN) = (st.getLong(0), st.getLong(1))
    val (dDl, dN) = writePostings(newDocs, root, "append")
    writeStats(s, root, oldDl + dDl, oldN + dN)
    SessionCaches.remarkComplete(root)
    s.catalog.refreshByPath(s"$root/postings")
    s.catalog.refreshByPath(s"$root/stats")
    SessionCaches.rehomeDurable(s, s"bm25-postings:$d", root)
  }

  /** Targeted delete from the postings index — the retrieval side of
    * the tombstone contract ([[Similarity.deleteFromIvfIndex]]'s
    * scaladoc: a deleted document must leave EVERY served artifact). A
    * doc's postings are scattered across the term-hash buckets of its
    * distinct terms, so the touched-bucket discovery is a column-pruned
    * semi-join over the postings (doc_id + bucket columns only — the
    * rewrite, not the discovery, is the expensive part and it stays
    * ∝ touched buckets); the one-row corpus stats decrement in the same
    * exact integer arithmetic the refresh accumulates in, so a
    * delete-then-serve BM25 equals the from-scratch scan over the
    * surviving docs exactly (IndexRefreshSpec asserts). */
  def deleteFromPostingsIndex(s: SparkSession, d: String,
      docIds: DataFrame): String = {
    val root = postingsIndexDir(s, d)
    val doomed = IndexMaintenance.deleteKeys(
      s, s"$root/postings", "bucket", "doc_id", docIds, carry = Seq("dl"))
    if (!doomed.isEmpty) {
      // one dl per deleted doc (dl repeats on each of its term rows)
      val del = doomed.select(col("doc_id"), col("dl")).distinct()
        .agg(sum(col("dl")).cast("long"), count(lit(1))).head()
      val st = s.read.parquet(s"$root/stats").head()
      writeStats(s, root, st.getLong(0) - del.getLong(0),
        st.getLong(1) - del.getLong(1))
      SessionCaches.remarkComplete(root)
      s.catalog.refreshByPath(s"$root/postings")
      s.catalog.refreshByPath(s"$root/stats")
    }
    root
  }

  /** Postings twin of [[Similarity.compactIvfIndex]]: term-hash buckets
    * fragment one file per [[refreshPostingsIndex]] append. */
  def compactPostingsIndex(s: SparkSession, d: String,
      maxFilesPerBucket: Int = 4): String = {
    val root = postingsIndexDir(s, d)
    if (IndexMaintenance.compactPartitions(
        s, s"$root/postings", "bucket", maxFilesPerBucket).nonEmpty) {
      SessionCaches.remarkComplete(root)
      s.catalog.refreshByPath(s"$root/postings")
    }
    root
  }

  /** CRC32 of the UTF-8 term bytes mod [[TermBuckets]] — the driver-side
    * twin of the `pmod(crc32(term), 32)` partition key above. */
  private def termBucket(t: String): Int = {
    val c = new java.util.zip.CRC32
    c.update(t.getBytes("UTF-8"))
    (c.getValue % TermBuckets).toInt
  }

  /** BM25 top-k against the materialized index: identical scores to
    * [[bm25TopK]] (same oracle SQL), but the scan is the postings index
    * with `bucket IN (buckets of the query terms)` as a PARTITION filter
    * — at most |terms| of the 32 term partitions are listed, and the raw
    * text is never touched. */
  def bm25TopKIndexed(s: SparkSession, d: String,
                      terms: Seq[String] = QueryTerms, k: Int = 20): DataFrame = {
    val root = postingsIndexDir(s, d)
    val st = s.read.parquet(s"$root/stats").head()
    val (dlSum, nDocs) = (st.getLong(0), st.getLong(1))
    val avgdl = dlSum.toDouble / nDocs.toDouble
    val buckets = terms.map(termBucket).distinct
    val tf = s.read.parquet(s"$root/postings")
      .filter(col("bucket").isin(buckets: _*))
      .filter(col("term").isin(terms: _*))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs.toDouble) - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
    val norm = col("tf") + lit(K1) * (lit(1.0 - B) + lit(B) * col("dl") / lit(avgdl))
    val contrib = idf * (col("tf") * lit(K1 + 1.0)) / norm
    tf.join(broadcast(df), "term")
      .groupBy(col("doc_id"))
      .agg(round(sum(contrib.cast("decimal(28,8)")).cast("double"), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Corpus-wide top-20 bigrams with counts — the boilerplate/stock-phrase
    * detector. One narrow explode into overlapping 2-token windows, one
    * count aggregation keyed on the gram text (map-side combinable), then
    * TakeOrderedAndProject for the top slice. Count ties at the cut are
    * broken by gram text, so the boundary is deterministic. */
  def topBigrams(s: SparkSession, d: String, k: Int = 20): DataFrame =
    topBigramsOf(Tables.documents(s, d), k)

  def topBigramsOf(docs: DataFrame, k: Int = 20): DataFrame =
    docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> concat_ws(' ', slice(toks, i + 1, 2)))"))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(k)

  val topBigramsOracle: String =
    """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
      |           WHERE len(string_split(text, ' ')) >= 2),
      |g AS (SELECT array_to_string(toks[pos + 1 : pos + 2], ' ') AS gram
      |      FROM t, LATERAL (SELECT unnest(generate_series(0, len(toks) - 2)) AS pos) p)
      |SELECT gram, CAST(count(*) AS BIGINT) AS n
      |FROM g GROUP BY 1 ORDER BY n DESC, gram LIMIT 20""".stripMargin

  val defs: Seq[Q] = Seq(
    Q("text_bm25_topk", Some(bm25TopKOracle), (s, d) => bm25TopK(s, d)),
    Q("text_bm25_indexed", Some(bm25TopKOracle), (s, d) => bm25TopKIndexed(s, d)),
    Q("text_top_bigrams", Some(topBigramsOracle), (s, d) => topBigrams(s, d)))
}
