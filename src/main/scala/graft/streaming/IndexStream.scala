package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming ANN index maintenance — the STREAM leg of the index
  * lifecycle whose batch legs already exist: one-time build
  * ([[Similarity.ivfIndexDir]]), incremental append
  * ([[Similarity.refreshIvfIndex]], cost ∝ delta), targeted delete and
  * compaction, and the staleness readout
  * ([[Similarity.indexStaleness]]). A training-data pipeline that
  * streams embeddings in (fresh crawl, new modality batches) wants the
  * served retrieval index to FOLLOW the stream, not wait for a nightly
  * rebuild — and wants the retrain trigger watched continuously, not
  * re-derived by scanning the corpus.
  *
  * Per micro-batch, all cost ∝ batch: arrivals are quantized ONCE
  * against the index's FROZEN centroids ([[Similarity.assignCells]]);
  * the assignment feeds (a) the cell-partitioned append — the
  * incremental-refresh contract, pre-existing index files stay
  * byte-untouched, kNN serves between any two batches read the union
  * corpus with the same partition pruning — and (b) the health census:
  * a bounded k-row cumulative rollup PLUS a k-row last-batch snapshot
  * (the maintained-view family's additive-census pattern —
  * [[CorpusStream.upsertContingencyRollup]]).
  *
  * Replay stance: the batch id is committed to a marker inside the
  * index (`_stream_batch`) after the appends, and a batch with id ≤ the
  * marker is skipped — so the COMMON replay (restart re-delivers the
  * last completed batch because the source offset commit lost the race)
  * is idempotent for both the index and the census. The residual window
  * is a crash BETWEEN the append and the marker write; closing it needs
  * a transactional file commit log (the FileStreamSink design), which
  * this maintained view deliberately does not re-implement — the
  * checkpointed-sink ingest path ([[Ingest]]) is the exactly-once
  * story, and [[Similarity.repairIvfIndexDuplicates]] (keep one row per
  * vec_id, rewrite only the duplicated cells) +
  * [[Similarity.compactIvfIndex]] are the recovery tools if that window
  * is ever hit — StreamingIndexSpec drives the window and the repair.
  *
  * IVF is the maintained index here because it is the one with
  * quantizer STATE to watch (frozen centroids → staleness). An LSH
  * stream twin is [[Similarity.refreshLshIndex]] per batch verbatim —
  * the hyperplanes are seed-pinned, so there is no staleness concept to
  * monitor, only the same fragmentation [[Similarity.compactLshIndex]]
  * already handles.
  */
object IndexStream {

  /** Start maintaining the IVF index for `corpus` from `arrivals`
    * (vec_id, label, embedding). Each micro-batch appends to the served
    * index and upserts the health census under `healthDir`. */
  def maintainIvf(s: SparkSession, corpus: String, arrivals: DataFrame,
      healthDir: String, checkpoint: String): StreamingQuery =
    arrivals.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(s, corpus, batch, batchId, healthDir)
      }
      .start()

  /** One micro-batch of maintenance; idempotent for replayed batch ids
    * (see the object scaladoc's replay stance). Exposed so a replay can
    * be driven deterministically in tests. */
  private[graft] def processBatch(s: SparkSession, corpus: String,
      batch: DataFrame, batchId: Long, healthDir: String): Unit = {
    if (batch.isEmpty) return
    val dir = Similarity.ivfIndexDir(s, corpus)
    val marker = new Path(dir, "_stream_batch")
    val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
    val committed =
      if (!fs.exists(marker)) -1L
      else {
        val in = fs.open(marker)
        val text =
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        text.toLongOption.getOrElse(throw new IllegalStateException(
          s"unreadable stream-batch marker '$text' at $marker — a crash " +
            "mid-commit should be impossible (temp+rename write); delete " +
            "the marker and run Similarity.repairIvfIndexDuplicates to " +
            "recover, then restart the stream"))
      }
    if (batchId <= committed) return // replayed batch: already folded in
    // quantize once; the materialized assignment feeds census AND append
    val assigned = Similarity.assignCells(s, dir,
      batch.select(col("vec_id"), col("label"), col("embedding")))
      .localCheckpoint()
    upsertHealthCensus(assigned, healthDir)
    Similarity.appendAssignedToIvfIndex(s, corpus, assigned)
    // temp + atomic rename: a truncate-in-place write could be caught
    // mid-stream by a crash, leaving an empty marker that wedges every
    // subsequent batch on parse
    val tmp = new Path(dir, "_stream_batch.tmp")
    val out = fs.create(tmp, true)
    try out.write(batchId.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(marker, false)
    if (!fs.rename(tmp, marker)) throw new IllegalStateException(
      s"could not commit stream-batch marker $marker")
  }

  /** Fold one assigned micro-batch into the health census: the
    * cumulative k-row rollup (cell, n, cos_sum) via read-touched-cells +
    * union + re-aggregate + dynamic partition overwrite, PLUS a k-row
    * last-batch snapshot (full overwrite — it IS the batch). Both stay
    * bounded by k whatever the stream's history. */
  private[graft] def upsertHealthCensus(assigned: DataFrame,
      rollupDir: String): Unit = {
    val s = assigned.sparkSession
    val delta = assigned
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), sum(col("cos")).as("cos_sum"))
      .localCheckpoint()
    val touched = delta.select("cell").distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    delta.coalesce(1).write.mode("overwrite").parquet(lastDir(rollupDir))
    val existing =
      if (Ingest.rollupExists(s, rollupDir)) {
        val state = s.read.parquet(rollupDir)
        // the mergeMinuteRollup layout contract: a drifted state dir
        // must fail with the remedy named, not wedge the stream with an
        // UNRESOLVED_COLUMN inside unionByName
        if (state.columns.sorted.toSeq != delta.columns.sorted.toSeq)
          throw new IllegalStateException(
            s"health census at $rollupDir has columns " +
              s"[${state.columns.sorted.mkString(",")}] but this engine " +
              s"writes [${delta.columns.sorted.mkString(",")}]: rebuild " +
              "the census (delete the directory) or serve it with the " +
              "version that wrote it")
        state.filter(col("cell").isin(touched: _*)).localCheckpoint()
      } else
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

  private def lastDir(rollupDir: String): String = rollupDir + "_last"

  /** Serve the retrain readout from the maintained census: per cell,
    * cumulative arrivals + mean assignment quality, the LAST batch's
    * arrivals, and the `stale` flag. The flag applies the batch
    * [[Similarity.indexStaleness]] rule (>4× the uniform share) to the
    * LAST batch, not to all history — a drifted batch must trip the
    * trigger even after months of balanced arrivals diluted the
    * cumulative shares, and a healthy batch clears it (recency is the
    * point of watching continuously). `k` is the quantizer's cell count,
    * taken from the served index so the two readouts cannot disagree. */
  def servedIndexHealth(s: SparkSession, corpus: String,
      rollupDir: String): DataFrame = {
    val k = Similarity.indexCentroids(
      s, Similarity.ivfIndexDir(s, corpus)).size
    val census = s.read.parquet(rollupDir)
      .select(col("cell"), col("n"), col("cos_sum"))
    val last = s.read.parquet(lastDir(rollupDir))
      .select(col("cell"), col("n").as("n_last"))
    val lastTotal = last.agg(sum(col("n_last"))).head().getLong(0)
    census.join(last, Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("n"), lit(0L)).as("n"),
        round(col("cos_sum") / col("n"), 4).as("avg_cos"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        (coalesce(col("n_last"), lit(0L)) * k > lastTotal * 4)
          .cast("int").as("stale"))
      .orderBy(col("cell"))
  }
}
