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
}
