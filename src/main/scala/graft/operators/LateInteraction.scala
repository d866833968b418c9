package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** ColBERT-style late-interaction retrieval (Khattab & Zaharia 2020):
  * score(query, doc) = Σ_terms max_chunks cos(term_vec, chunk_vec) — each
  * query term independently finds its best-matching chunk, so a document
  * that covers ALL terms across different passages beats one that piles
  * the whole query into a single chunk. The re-ranking readout between
  * single-vector ANN retrieval ([[Similarity]]) and generation.
  *
  * Embedder: hashed ±1 signs like [[Rag.embedCol]], but drawn from the
  * md5-h32 of each token (bit i of the first 32 hash bits) instead of
  * xxhash64 — deliberately, because md5 exists in BOTH engines, which
  * upgrades this operator from golden-pinned to FULLY independently
  * recomputed: DuckDB re-chunks, re-embeds, and re-scores everything
  * from the parquet alone.
  *
  * Numeric contract (why no lattice/rounding tricks are needed): chunk
  * embeddings and dot products are EXACT int64 (±1 signs summed over ≤40
  * tokens); the only float ops are `dot / (4·sqrt(ss))` and the 6-term
  * sum in FIXED term order — sqrt, ×, ÷, + are all IEEE correctly
  * rounded in both engines, so the scores are bit-identical cross-engine
  * by construction, not within-epsilon.
  *
  * Scale shape: chunking + embedding are the narrow explode/HOF pass of
  * the RAG pipeline (shared geometry with [[Rag.chunksWithText]]); the 6
  * per-term cosines are computed per chunk in one projection; per-doc
  * max/sum is ONE map-side-combinable aggregate (chunk rows of a doc are
  * co-located); the final top-k is TakeOrderedAndProject. At real scale
  * the chunk set comes pre-filtered by the ANN index shortlist — this
  * operator is the re-rank stage, and its cost is |shortlist|·|terms|.
  */
object LateInteraction {

  private val Dim = 16

  /** Query terms, fixed order — the late-interaction sum follows this
    * order exactly on both engines. */
  private[operators] val Terms: Seq[String] =
    Rag.QueryText.split(" ").toSeq

  private def h32(t: Column): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long")

  /** Integer hashed-sign embedding of a space-tokenized chunk:
    * emb[i] = Σ_tokens (1 − 2·bit_i(h32(token))). One md5 per token. */
  private[operators] def intEmbedCol(textCol: Column): Column = {
    val hashes = transform(split(textCol, " "), t => h32(t))
    val dimSigns = (h: Column) =>
      transform(sequence(lit(0), lit(Dim - 1)), i =>
        lit(1L) - lit(2L) * call_function("shiftright", h, i).bitwiseAND(lit(1L)))
    aggregate(hashes, expr(s"array_repeat(cast(0 as bigint), $Dim)"),
      (acc, h) => zip_with(acc, dimSigns(h), (a, sgn) => a + sgn))
  }

  /** Driver-side twin of the embedder for single query terms. */
  private[operators] def termSigns(term: String): Seq[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    val h = java.lang.Long.parseLong(md.take(4).map(b => f"$b%02x").mkString, 16)
    (0 until Dim).map(i => 1L - 2L * ((h >> i) & 1L))
  }

  /** Top-10 documents by late-interaction MaxSim for the standard query. */
  def maxsimTopK(s: SparkSession, d: String): DataFrame =
    maxsimTopKOf(Tables.documents(s, d))

  def maxsimTopKOf(docs: DataFrame, k: Int = 10): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val chunks = Rag.chunksWithText(docs)
      .withColumn("emb", intEmbedCol($"chunk_text"))
      .withColumn("ss",
        aggregate($"emb", lit(0L), (a, x) => a + x * x))
      .where($"ss" > 0L)
    // per-chunk cosine against each term: exact integer dot, then the
    // one IEEE-exact float expression dot/(4*sqrt(ss))
    val withCos = Terms.zipWithIndex.foldLeft(chunks) { case (df, (t, ti)) =>
      val signs = typedlit(termSigns(t))
      val dot = aggregate(zip_with($"emb", signs, (e, sg) => e * sg),
        lit(0L), (a, x) => a + x)
      df.withColumn(s"cos$ti",
        dot.cast("double") / (lit(4.0d) * sqrt($"ss".cast("double"))))
    }
    val maxCols = Terms.indices.map(ti => max(col(s"cos$ti")).as(s"m$ti"))
    val perDoc = withCos.groupBy($"doc_id")
      .agg(maxCols.head, maxCols.tail :+ count(lit(1)).as("n_chunks"): _*)
    val score = Terms.indices.map(ti => col(s"m$ti")).reduceLeft(_ + _)
    perDoc
      .select($"doc_id", $"n_chunks", round(score, 6).as("maxsim"))
      .orderBy(col("maxsim").desc, $"doc_id")
      .limit(k)
  }

  /** Fully independent DuckDB oracle: re-chunk (Rag geometry: 40-token
    * windows, stride 30), re-embed (md5-h32 signs), re-score, re-rank. */
  val maxsimOracle: String = {
    val termRows = Terms.zipWithIndex
      .map { case (t, ti) => s"($ti, '$t')" }.mkString(", ")
    val maxCase = Terms.indices
      .map(ti => s"max(CASE WHEN term_idx = $ti THEN cos END) AS m$ti")
      .mkString(",\n         ")
    val scoreSum = Terms.indices.map(ti => s"m$ti").mkString(" + ")
    s"""WITH toks AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |chunks AS MATERIALIZED (
       |  SELECT doc_id, c,
       |         list_slice(ts, c * 30 + 1, LEAST(c * 30 + 40, len(ts))) AS ct
       |  FROM toks,
       |       UNNEST(generate_series(0,
       |         GREATEST(CAST(ceil((len(ts) - 10) / 30.0) AS BIGINT) - 1, 0))) AS u(c)),
       |ctok AS MATERIALIZED (
       |  SELECT doc_id, c, CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS h
       |  FROM chunks, UNNEST(ct) AS v(t)),
       |cemb AS MATERIALIZED (
       |  SELECT doc_id, c, i,
       |         CAST(sum(1 - 2 * ((h >> i) & 1)) AS BIGINT) AS e
       |  FROM ctok, UNNEST(generate_series(0, ${Dim - 1})) AS w(i)
       |  GROUP BY doc_id, c, i),
       |qterm(term_idx, term) AS (VALUES $termRows),
       |qemb AS (
       |  SELECT term_idx, i,
       |         1 - 2 * ((CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) >> i) & 1)
       |           AS sg
       |  FROM qterm, UNNEST(generate_series(0, ${Dim - 1})) AS w(i)),
       |norms AS (
       |  SELECT doc_id, c, CAST(sum(e * e) AS BIGINT) AS ss
       |  FROM cemb GROUP BY doc_id, c),
       |dots AS (
       |  SELECT ce.doc_id, ce.c, q.term_idx, CAST(sum(ce.e * q.sg) AS BIGINT) AS dot
       |  FROM cemb ce JOIN qemb q USING (i)
       |  GROUP BY ce.doc_id, ce.c, q.term_idx),
       |cosines AS (
       |  SELECT d.doc_id, d.c, d.term_idx,
       |         CAST(d.dot AS DOUBLE) / (4.0 * sqrt(CAST(n.ss AS DOUBLE))) AS cos
       |  FROM dots d JOIN norms n USING (doc_id, c)
       |  WHERE n.ss > 0),
       |per_doc AS (
       |  SELECT doc_id,
       |         $maxCase,
       |         CAST(count(DISTINCT c) AS BIGINT) AS n_chunks
       |  FROM cosines GROUP BY doc_id)
       |SELECT doc_id, n_chunks, round($scoreSum, 6) AS maxsim
       |FROM per_doc
       |ORDER BY maxsim DESC, doc_id
       |LIMIT 10""".stripMargin
  }

  val defs: Seq[Q] = Seq(
    Q("sim_maxsim_topk", Some(maxsimOracle), maxsimTopK))
}
