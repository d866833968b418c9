package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CorpusDedup

/** Streaming corpus ingestion dedup: the C4-style segment dedup
  * (operators/CorpusDedup.segmentDedupStats) applied AT INGEST TIME — a
  * training-data pipeline that streams crawled documents in wants
  * repeated spans dropped before they ever land in the warehouse, not in
  * a nightly batch over what already landed.
  *
  * `dropDuplicatesWithinWatermark` keys on the segment content hash: the
  * first arrival of a segment passes, later copies are suppressed while
  * their event time is within the watermark of the first — and the
  * dedup state for a hash is DROPPED once the watermark passes it, so
  * state is bounded by the segment arrival rate × watermark window, not
  * by corpus history (the property that keeps this runnable forever;
  * exact global dedup over all history is the batch operator's job).
  *
  * Scale shape: the segment explode is narrow; the dedup is one hash
  * shuffle on seg_md5 (uniform by construction) into per-partition
  * RocksDB/HDFS state — the same key the batch plan shuffles on.
  */
object CorpusStream {

  /** First-occurrence segments of a streaming (doc_id, text, ts) frame.
    * The input must be watermarkable on `ts`; emits one row per segment
    * that was not seen within the watermark window. */
  def dedupedSegments(docs: DataFrame, watermark: String = "10 minutes",
      segLen: Int = CorpusDedup.SegLen): DataFrame =
    CorpusDedup.withSegments(
        docs.withWatermark("ts", watermark)
          .select(col("doc_id"), col("ts"), col("text")), segLen)
      .select(col("doc_id"), col("ts"), col("seg_idx"), col("seg_md5"))
      .dropDuplicatesWithinWatermark(Seq("seg_md5"))

  /** The SemDeDup family's STREAMING twin (round-6 verdict "Next round"
    * #8): semantic admission control at ingest time. Arrivals
    * (vec_id, embedding, ts) that semantically duplicate the standing
    * corpus — cosine ≥ `minCos` against a same-cell corpus vector — are
    * dropped before they land; survivors flow on unchanged.
    *
    * Mechanics, all bounded-state:
    *  - exact repeats within the watermark are suppressed first by
    *    content signature (`dropDuplicatesWithinWatermark` — state
    *    bounded by arrival rate × window, like [[dedupedSegments]]);
    *  - the vs-corpus check is a STATELESS stream-static LEFT ANTI join
    *    against the corpus's cell-assigned semantic index
    *    ([[graft.operators.Similarity.corpusSemIndex]]) with the cosine
    *    predicate in the join condition — cell equality confines the
    *    pair work exactly as batch SemDeDup's Σ|cell|² bound does.
    *
    * Cross-arrival NEAR-dup election (non-identical arrivals duplicating
    * each other) is deliberately NOT streamed: that state grows with
    * history, which is the incremental batch job's role
    * ([[graft.operators.Similarity.incrementalSemDedup]]) — same
    * division of labor as exact-global vs windowed segment dedup above. */
  def semanticAdmission(s: org.apache.spark.sql.SparkSession, d: String,
      arrivals: DataFrame, minCos: Double = 0.95,
      watermark: String = "10 minutes"): DataFrame = {
    import graft.operators.Similarity
    val cents = Similarity.kmeansCentroids(s, d)
    val idx = Similarity.corpusSemIndex(s, d)
    val a = arrivals
      .withWatermark("ts", watermark)
      .withColumn("sig", md5(to_json(struct(col("embedding")))))
      .dropDuplicatesWithinWatermark(Seq("sig"))
      .withColumn("cell", Similarity.cellAssign(cents)(col("embedding")))
      .withColumn("nrm", graft.functions.VectorOps.norm(col("embedding")))
    a.join(idx,
        a("cell") === idx("cell") &&
          graft.functions.VectorOps.dot(a("embedding"), idx("c_emb")) /
            (a("nrm") * idx("c_nrm")) >= minCos,
        "left_anti")
      .drop("sig", "cell", "nrm")
  }

  /** Perplexity admission at ingest time: the batch-trained bigram LM
    * ([[graft.operators.NgramLm]], the CCNet quality gate) serving in the
    * stream path — arrivals whose log-perplexity under the corpus LM
    * clears the threshold are admitted, gibberish is dropped before it
    * lands. This is the production split: the LM trains offline on the
    * trusted corpus (one batch job), and the scorer is a BROADCAST MODEL
    * applied statelessly per arrival.
    *
    * Mechanics: exact repeats are suppressed by content signature within
    * the watermark (bounded state, as [[dedupedSegments]]); scoring is
    * 100% IN-ROW — the bigram walk, LM lookup with add-one back-off
    * (seen bigram → lnp; unseen continuation of a seen context →
    * ln(1/(c1+V)); unseen context → ln(1/V)), and the lattice sum all
    * run inside higher-order array functions on the row, so the stream
    * stage is STATELESS (no shuffle, no aggregation state) and scores
    * are the IDENTICAL integers the batch `text_bigram_ppl` computes.
    * The LM is vocab-bounded model state embedded as literals — the same
    * broadcast-by-value contract as LR weights and k-means centroids. */
  def perplexityAdmission(s: org.apache.spark.sql.SparkSession, d: String,
      arrivals: DataFrame, keepBelowMicro: Long = graft.operators.NgramLm.KeepBelowMicro,
      watermark: String = "10 minutes"): DataFrame = {
    val (lm, backoff, unseen) = graft.operators.NgramLm.lmModel(s, d)
    val lmCol = typedlit(lm)
    val boCol = typedlit(backoff)
    val toks = split(col("text"), " ")
    val prev = concat(array(lit("<s>")), slice(toks, lit(1), size(toks) - 1))
    val pairs = zip_with(prev, toks, (a, b) => concat_ws(" ", a, b))
    val sumLnp = aggregate(pairs, lit(0L), (acc, p) =>
      acc + coalesce(
        element_at(lmCol, p),
        element_at(boCol, element_at(split(p, " "), 1)),
        lit(unseen)))
    arrivals
      .withWatermark("ts", watermark)
      .withColumn("sig", md5(col("text")))
      .dropDuplicatesWithinWatermark(Seq("sig"))
      .withColumn("n_bigrams", size(toks).cast("long"))
      .withColumn("sum_lnp_micro", sumLnp)
      .withColumn("logppl_micro", expr("(-sum_lnp_micro) div n_bigrams"))
      .where(col("logppl_micro") < keepBelowMicro)
      .drop("sig")
  }

  /** Continuously-maintained lang × source contingency census — the
    * DRIFT-STATISTIC member of the maintained-view family (counts /
    * HLL / KLL / MG / FD in [[Ingest]]): observed-cell counts are purely
    * additive, so the maintained view IS the census that
    * [[graft.operators.Drift.chi2OfCells]] and
    * [[graft.operators.Drift.miOfCells]] compute from — χ², MI, NMI and
    * the full entropy decomposition are served at ANY time without
    * re-touching a single raw document. Cost per batch is
    * O(batch + touched source-partitions); cell state is the bounded
    * |langs|×|sources| grid. Same batch-id replay caveat as the counts.
    *
    * This closes the audit loop the batch queries open: the batch
    * `audit_chi2_lang_source` / `audit_mi_lang_source` establish the
    * reference association; the streaming view keeps TODAY's census
    * current so the comparison is a constant-time cell read, which is
    * how a production mix-shift alarm actually runs. */
  def upsertContingencyRollup(batch: DataFrame, rollupDir: String): Unit = {
    val s = batch.sparkSession
    val delta = batch
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
    val touched = delta.select("source").distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val existing =
      if (Ingest.rollupExists(s, rollupDir)) {
        val state = s.read.parquet(rollupDir)
        // the mergeMinuteRollup layout contract: fail with the remedy
        // named instead of an UNRESOLVED_COLUMN inside unionByName
        if (state.columns.sorted.toSeq != delta.columns.sorted.toSeq)
          throw new IllegalStateException(
            s"contingency census at $rollupDir has columns " +
              s"[${state.columns.sorted.mkString(",")}] but this engine " +
              s"writes [${delta.columns.sorted.mkString(",")}]: rebuild " +
              "the census (delete the directory) or serve it with the " +
              "version that wrote it")
        state.filter(col("source").isin(touched: _*)).localCheckpoint()
      } else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          delta.schema)
    existing.unionByName(delta)
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("o")).as("o"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("source")
      .parquet(rollupDir)
  }

  /** Serve χ² and MI/NMI from the maintained census in one constant-time
    * read of the bounded cell grid. */
  def servedChi2(s: org.apache.spark.sql.SparkSession, rollupDir: String): DataFrame =
    graft.operators.Drift.chi2OfCells(
      s.read.parquet(rollupDir).select(col("lang"), col("source"), col("o")))

  def servedMi(s: org.apache.spark.sql.SparkSession, rollupDir: String): DataFrame =
    graft.operators.Drift.miOfCells(
      s.read.parquet(rollupDir).select(col("lang"), col("source"), col("o")))
}
