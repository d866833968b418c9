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
}
