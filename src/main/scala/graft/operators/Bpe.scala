package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE (byte-pair encoding) vocabulary TRAINING — the step the
  * rest of the text stack assumes already happened ([[TextOps]] tokenizes
  * with a BPE-ish regex; this learns the merge table itself, the way a
  * tokenizer for a new corpus/language actually gets built).
  *
  * Classic Sennrich et al. 2016 formulation, Spark-shaped:
  *
  *  - training operates on the DISTINCT-WORD table with corpus counts
  *    (vocab-sized, not corpus-sized — the standard trick that makes BPE
  *    training tractable), capped at the top 5 000 words by (count, word)
  *    for a deterministic, bounded working set;
  *  - each merge round is one distributed pair-count aggregate (flatMap
  *    adjacent symbol pairs → groupBy → sum) followed by a 1-row argmax
  *    `limit(1).collect()` — the only driver traffic is one (pair, count)
  *    per round; the symbol sequences themselves never leave executors.
  *    `localCheckpoint` per round cuts the iterative lineage exactly like
  *    the PageRank loop ([[Graph]]);
  *  - merge application is the standard greedy left-to-right
  *    non-overlapping scan; ties in the argmax break by (count DESC,
  *    left, right) so the learned table is bit-deterministic.
  *
  * The DuckDB oracle is FULLY independent and golden-free: it replays all
  * `NMerges` rounds as an unrolled CTE chain (pair counting via
  * `list_zip` over the split symbol string; merge application via the
  * double-space `replace` trick, whose non-overlapping left-to-right
  * semantics exactly match the greedy scan), then re-derives the per-doc
  * encoding from its own learned table.
  *
  * Scale posture: pair counting shuffles a vocab-bounded relation (≤5k
  * rows/round); encoding is a ZERO-shuffle narrow map (tokens of a doc
  * live in its own row, so per-doc stats aggregate inside the row). At
  * 100 TB the corpus-sized work is the one tokenizing scan that builds
  * the word table — a map + one vocab-keyed aggregate, the same cost as
  * `text_word_count`.
  */
object Bpe {

  val NMerges = 10
  val VocabCap = 5000
  private val TokenRe = "[a-z0-9]+"

  /** Learned merge table: (rank, left, right, pairCount). */
  private[operators] def learnMerges(s: SparkSession, d: String): Seq[(Int, String, String, Long)] =
    SessionCaches.modelMemo(s, s"bpe-merges:$d") {
      learnMergesOf(Tables.documents(s, d))
    }

  /** Exact per-word corpus counts — the vocab-sized relation everything
    * in BPE training derives from. */
  private[operators] def wordCountsOf(docs: DataFrame): DataFrame =
    docs
      .select(explode(expr(s"regexp_extract_all(lower(text), '$TokenRe', 0)")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** [[learnMerges]] over any (text) relation — tune/spec entry point. */
  private[operators] def learnMergesOf(docs: DataFrame): Seq[(Int, String, String, Long)] =
    learnFromWordCounts(wordCountsOf(docs))

  /** The merge rounds over an exact (word, cnt) relation. */
  private[operators] def learnFromWordCounts(wordCounts: DataFrame): Seq[(Int, String, String, Long)] = {
    val s: SparkSession = wordCounts.sparkSession
    import s.implicits._
    locally {
      val words = wordCounts
        .select($"word", $"cnt")
        .orderBy($"cnt".desc, $"word")
        .limit(VocabCap)
        .as[(String, Long)]
      var seqs: Dataset[(Array[String], Long)] =
        words.map { case (w, c) => (w.map(_.toString).toArray, c) }.localCheckpoint()
      val merges = Seq.newBuilder[(Int, String, String, Long)]
      var rank = 1
      while (rank <= NMerges) {
        val best = seqs
          .flatMap { case (seq, c) =>
            (0 until seq.length - 1).iterator.map(i => (seq(i), seq(i + 1), c))
          }
          .toDF("a", "b", "c")
          .groupBy($"a", $"b").agg(sum($"c").as("pc"))
          .orderBy($"pc".desc, $"a", $"b")
          .limit(1)
          .as[(String, String, Long)]
          .collect()(0)
        merges += ((rank, best._1, best._2, best._3))
        val (a, b) = (best._1, best._2)
        seqs = seqs.map { case (seq, c) => (applyMerge(seq, a, b), c) }.localCheckpoint()
        rank += 1
      }
      seqs.unpersist(blocking = false)
      merges.result()
    }
  }

  /** Greedy left-to-right non-overlapping merge — identical semantics to
    * the oracle's single-pattern `replace` (e.g. (a,a) on "a a a" merges
    * only the first pair). */
  private[operators] def applyMerge(seq: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < seq.length) {
      if (i + 1 < seq.length && seq(i) == a && seq(i + 1) == b) { out += (a + b); i += 2 }
      else { out += seq(i); i += 1 }
    }
    out.toArray
  }

  /** Apply the full learned merge list, in rank order, to one word. */
  private[operators] def encodeWord(word: String, merges: Seq[(Int, String, String, Long)]): Array[String] = {
    var seq = word.map(_.toString).toArray
    merges.foreach { case (_, a, b, _) => seq = applyMerge(seq, a, b) }
    seq
  }

  /** The learned merge table as a relation — BPE training's whole output
    * (rank-ordered; pair counts are provably non-increasing in rank,
    * which BpeSpec asserts). Bounded driver value (NMerges rows), same
    * contract as the reference's ≤5-row report build. */
  def bpeTrain(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    learnMerges(s, d)
      .toDF("rank", "left_sym", "right_sym", "pair_count")
      .select($"rank", $"left_sym", $"right_sym",
        concat($"left_sym", $"right_sym").as("merged"), $"pair_count")
      .orderBy($"rank")
  }

  /** Per-document encoding stats under the learned vocabulary: token and
    * BPE-symbol counts plus fixed-point compression (chars per symbol) —
    * the readout that tells you whether a tokenizer fits a corpus. All
    * tokens of a doc live in its row, so the whole query is a narrow map
    * + the driver-contract sort: zero shuffle at any corpus size. */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val merges = learnMerges(s, d)
    val re = TokenRe.r
    // widened: per-doc BPE encoding is the heaviest per-row closure in
    // the text family (guide §2.5); output is one exact row per doc
    Tables.widened(Tables.documents(s, d))
      .select($"doc_id", lower($"text").as("t"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = re.findAllIn(t).toArray
        if (toks.isEmpty) Iterator.empty
        else {
          var nCh = 0L
          var nSym = 0L
          toks.foreach { w =>
            nCh += w.length
            nSym += encodeWord(w, merges).length
          }
          Iterator.single((id, toks.length.toLong, nCh, nSym,
            math.floor(10000d * nCh.toDouble / nSym).toLong))
        }
      }
      .toDF("doc_id", "n_tokens_word", "n_chars_alnum", "n_tokens_bpe", "chars_per_tok_e4")
      .orderBy($"doc_id")
  }

  /** The ∝-delta refresh family extended to the TOKENIZER: the corpus
    * word-count table is a maintained artifact (built once from the base
    * split, doc_id % 10 ≠ 7); an append (the % 10 = 7 docs playing the
    * incoming batch) costs one delta-sized tokenize scan plus a
    * vocab-keyed merge — never a base-corpus rescan — and the merge
    * rounds then run on the (bounded) merged vocab, which Leg 19 shows
    * is the cheap part. Counts merge EXACTLY (integer sums), so refresh
    * ≡ full rebuild bit-for-bit — which is why this query is gated
    * against the FULL-CORPUS relearning oracle, the
    * dedup_cluster_incremental pattern: any drift in the delta algebra
    * fails the hard gate. */
  def bpeTrainIncremental(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // the learned merge table is itself a durable artifact (the model a
    // tokenizer service loads), served as a FileScan like every other
    // engine artifact (ArtifactServeSpec)
    SessionCaches.parquetArtifact(s, s"bpe-merges-incr:$d") { dir =>
      val baseCounts = SessionCaches.parquetArtifact(s, s"bpe-wordcounts:$d") { wdir =>
        wordCountsOf(Tables.documents(s, d).filter($"doc_id" % 10 =!= 7))
          .coalesce(1).write.mode("overwrite").parquet(wdir)
      }
      val delta = wordCountsOf(Tables.documents(s, d).filter($"doc_id" % 10 === 7))
      val merged = baseCounts.select($"word", $"cnt")
        .unionByName(delta)
        .groupBy($"word").agg(sum($"cnt").as("cnt"))
      learnFromWordCounts(merged)
        .toDF("rank", "left_sym", "right_sym", "pair_count")
        .select($"rank", $"left_sym", $"right_sym",
          concat($"left_sym", $"right_sym").as("merged"), $"pair_count")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    }.orderBy($"rank")
  }

  // --- fully independent unrolled oracles --------------------------------

  /** One merge-application step in SQL: double every space, replace the
    * boundary-delimited pair pattern (non-overlapping left-to-right, the
    * same greedy semantics as [[applyMerge]]), collapse spaces back (two
    * passes cover any run), trim. */
  private def applySql(seqExpr: String, aExpr: String, bExpr: String): String =
    s"""trim(replace(replace(replace('  ' || replace($seqExpr, ' ', '  ') || '  ',
       |      ' ' || $aExpr || '  ' || $bExpr || ' ', ' ' || $aExpr || $bExpr || ' '),
       |      '  ', ' '), '  ', ' '))""".stripMargin

  /** CTE chain `words, seq0, pairs0, best0, seq1, …, seq{n}` that relearns
    * the whole merge table from the documents table alone. */
  private def trainCtes: String = {
    val ctes = Seq.newBuilder[String]
    ctes += s"""words AS (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '$TokenRe')) AS word FROM documents) t
       |  GROUP BY word ORDER BY cnt DESC, word LIMIT $VocabCap)""".stripMargin
    ctes += "seq0 AS (SELECT word, cnt, array_to_string(regexp_split_to_array(word, ''), ' ') AS seq FROM words)"
    for (k <- 0 until NMerges) {
      ctes += s"""pairs$k AS (
         |  SELECT pr.a AS a, pr.b AS b, CAST(sum(cnt) AS BIGINT) AS pc
         |  FROM (SELECT unnest(list_zip(l[1:len(l)-1], l[2:len(l)])::STRUCT(a VARCHAR, b VARCHAR)[]) AS pr, cnt
         |        FROM (SELECT string_split(seq, ' ') AS l, cnt FROM seq$k) s) t
         |  GROUP BY pr.a, pr.b)""".stripMargin
      ctes += s"best$k AS (SELECT a, b, pc FROM pairs$k ORDER BY pc DESC, a, b LIMIT 1)"
      ctes += s"""seq${k + 1} AS (
         |  SELECT word, cnt, ${applySql("seq", "bk.a", "bk.b")} AS seq
         |  FROM seq$k, best$k bk)""".stripMargin
    }
    ctes.result().mkString(",\n")
  }

  private def trainOracle: String = {
    val union = (0 until NMerges)
      .map(k => s"SELECT ${k + 1} AS rank, a AS left_sym, b AS right_sym, a || b AS merged, pc AS pair_count FROM best$k")
      .mkString(" UNION ALL ")
    s"WITH $trainCtes\nSELECT * FROM ($union) u ORDER BY rank"
  }

  private def encodeOracle: String = {
    val encCtes = Seq.newBuilder[String]
    encCtes += s"""doctok AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '$TokenRe')) AS word FROM documents)""".stripMargin
    encCtes += "enc0 AS (SELECT word, array_to_string(regexp_split_to_array(word, ''), ' ') AS seq FROM (SELECT DISTINCT word FROM doctok) v)"
    for (k <- 0 until NMerges)
      encCtes += s"""enc${k + 1} AS (
         |  SELECT word, ${applySql("seq", "bk.a", "bk.b")} AS seq FROM enc$k, best$k bk)""".stripMargin
    encCtes += s"encn AS (SELECT word, len(string_split(seq, ' ')) AS n_sym, length(word) AS n_ch FROM enc$NMerges)"
    s"""WITH $trainCtes,
       |${encCtes.result().mkString(",\n")}
       |SELECT doc_id,
       |       CAST(count(*) AS BIGINT) AS n_tokens_word,
       |       CAST(sum(n_ch) AS BIGINT) AS n_chars_alnum,
       |       CAST(sum(n_sym) AS BIGINT) AS n_tokens_bpe,
       |       CAST(floor(10000.0 * sum(n_ch) / sum(n_sym)) AS BIGINT) AS chars_per_tok_e4
       |FROM doctok JOIN encn USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[Q] = Seq(
    Q("text_bpe_train", Some(trainOracle), bpeTrain),
    Q("text_bpe_encode", Some(encodeOracle), bpeEncode),
    // refresh ≡ rebuild exactly (integer word counts merge exactly), so
    // the incremental path is gated against the full-relearn oracle
    Q("text_bpe_incremental", Some(trainOracle), bpeTrainIncremental))
}
