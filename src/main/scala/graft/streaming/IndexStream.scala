package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming ANN index maintenance — the STREAM leg of the index
  * lifecycle whose batch legs already exist: one-time build
  * ([[Similarity.ivfIndexDir]]), incremental append
  * ([[Similarity.refreshIvfIndex]], cost ∝ delta), and the staleness
  * readout ([[Similarity.indexStaleness]]). A training-data pipeline
  * that streams embeddings in (fresh crawl, new modality batches) wants
  * the served retrieval index to FOLLOW the stream, not wait for a
  * nightly rebuild — and wants the retrain trigger watched continuously,
  * not re-derived by scanning the corpus.
  *
  * Two maintained artifacts per micro-batch, both cost ∝ batch:
  *
  *  - the index itself: arrivals are quantized against the index's
  *    FROZEN centroids and appended to their cell partitions — exactly
  *    the incremental-refresh contract, so pre-existing index files stay
  *    byte-untouched and a kNN serve between any two batches reads the
  *    union corpus with the same partition pruning;
  *  - the health census: per-cell arrival counts + assignment-quality
  *    sums, upserted into a bounded k-row rollup (the maintained-view
  *    family's additive-census pattern — [[CorpusStream
  *    .upsertContingencyRollup]]); [[servedIndexHealth]] turns it into
  *    the same >4×-uniform-share retrain flag [[Similarity
  *    .indexStaleness]] computes in batch, served from a constant-time
  *    read that never touches raw arrivals again.
  *
  * Batch-replay caveat (same as every foreachBatch rollup here): a
  * micro-batch retried after a partial failure double-counts; the
  * exactly-once story is the checkpointed-sink ingest path's
  * ([[Ingest]]), and the census is a monitoring view where a bounded
  * overcount degrades gracefully.
  */
object IndexStream {

  /** Start maintaining the IVF index for `corpus` from `arrivals`
    * (vec_id, label, embedding). Each micro-batch appends to the served
    * index and upserts the per-cell health census in `healthDir`. */
  def maintainIvf(s: SparkSession, corpus: String, arrivals: DataFrame,
      healthDir: String, checkpoint: String): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val dir = Similarity.ivfIndexDir(s, corpus)
          upsertHealthCensus(
            Similarity.assignCells(s, dir, batch), healthDir)
          Similarity.refreshIvfIndex(
            s, corpus, batch.select(col("vec_id"), col("label"), col("embedding")))
        }
        ()
      }
      .start()

  /** Fold one assigned micro-batch into the k-row health census
    * (cell, n, cos_sum): read-touched-cells + union + re-aggregate +
    * dynamic partition overwrite — only the cells the batch touched are
    * rewritten, and the rollup stays bounded by k whatever the stream's
    * history. */
  private[graft] def upsertHealthCensus(assigned: DataFrame,
      rollupDir: String): Unit = {
    val s = assigned.sparkSession
    val delta = assigned
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("cos")).as("cos_sum"))
    val touched = delta.select("cell").distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val existing =
      if (Ingest.rollupExists(s, rollupDir))
        s.read.parquet(rollupDir)
          .filter(col("cell").isin(touched: _*))
          .localCheckpoint()
      else
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          delta.schema)
    existing.unionByName(delta)
      .groupBy(col("cell"))
      .agg(sum(col("n")).as("n"), sum(col("cos_sum")).as("cos_sum"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell")
      .parquet(rollupDir)
  }

  /** Serve the retrain readout from the maintained census: per cell,
    * cumulative arrivals, mean assignment quality, and the same
    * >4×-uniform-share `stale` flag the batch [[Similarity
    * .indexStaleness]] report computes — one constant-time read of the
    * bounded k-row rollup. `k` is the quantizer's cell count (the flag's
    * uniform-share denominator), taken from the served index so the two
    * readouts cannot disagree on it. */
  def servedIndexHealth(s: SparkSession, corpus: String,
      rollupDir: String): DataFrame = {
    val k = Similarity.indexCentroids(
      s, Similarity.ivfIndexDir(s, corpus)).size
    val census = s.read.parquet(rollupDir)
      .select(col("cell"), col("n"), col("cos_sum"))
    val total = census.agg(sum(col("n"))).head().getLong(0)
    census
      .select(col("cell"), col("n"),
        round(col("cos_sum") / col("n"), 4).as("avg_cos"),
        (col("n") * k > total * 4).cast("int").as("stale"))
      .orderBy(col("cell"))
  }
}
