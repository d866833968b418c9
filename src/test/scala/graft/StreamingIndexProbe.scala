package graft

import org.apache.spark.sql.functions._

/** Streaming index maintenance at scale — measures the claim the
  * IndexStream scaladoc makes: per-batch maintenance cost is ∝ |batch|,
  * never ∝ |corpus|, so a maintained 100 TB index follows its stream at
  * the arrival rate, not at the rebuild rate.
  *
  * Synthetic corpus (seeded, 64-dim, same shape as the embeddings
  * fixture) at 200k vectors; then 10 micro-batches of 2k arrivals (1% of
  * corpus each) fed through the same quantize → cell-append → census
  * upsert the stream's foreachBatch performs. Reports:
  *
  *   - full index build time (the rebuild a maintained index avoids);
  *   - per-batch refresh+census cost (median over the 10 batches);
  *   - serve latency before and after (the partition-pruned kNN read —
  *     appends must not degrade it);
  *   - the ratio corpus/batch (100×) vs build/refresh — the claim holds
  *     when refresh ≪ build and tracks batch size, not corpus size.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.StreamingIndexProbe"
  */
object StreamingIndexProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val nCorpus = 200000
    val nBatch = 2000
    val dim = 64

    // deterministic pseudo-random unit-scale coordinates via hashing —
    // seeded randn is not usable inside a higher-order-function lambda
    def synth(n: Int, idOffset: Long): org.apache.spark.sql.DataFrame =
      spark.range(n)
        .select(($"id" + idOffset).as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            j => ((pmod(xxhash64($"id" + idOffset, j), lit(2000L)) - 1000L) / 1000.0)
          ).cast("array<float>").as("embedding"),
          ($"id" % 8).cast("int").as("label"))

    val corpus = java.nio.file.Files.createTempDirectory("idx-probe").toString
    synth(nCorpus, 0L).write.parquet(s"$corpus/embeddings.parquet")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val (idx, tBuild) = timed(graft.operators.Similarity.ivfIndexDir(spark, corpus))
    println(f"[probe] build n=$nCorpus t=$tBuild%.2fs")

    def serve(): Double =
      timed(graft.operators.Similarity.knnIvfIndexed(spark, corpus).count())._2
    serve() // warm the quantizer memo + codegen
    val sBefore = serve()

    val healthDir = s"$corpus/health"
    val tBatches = (1 to 10).map { b =>
      val batch = synth(nBatch, 1000000L * b)
      val (_, t) = timed {
        // exactly the stream's processBatch shape: quantize once,
        // census + append share the materialized assignment
        val assigned = graft.operators.Similarity
          .assignCells(spark, idx, batch).localCheckpoint()
        graft.streaming.IndexStream.upsertHealthCensus(assigned, healthDir)
        graft.operators.Similarity.appendAssignedToIvfIndex(spark, corpus, assigned)
      }
      t
    }.sorted
    val sAfter = serve()
    println(f"[probe] refresh median=${tBatches(4)}%.2fs min=${tBatches.head}%.2fs " +
      f"max=${tBatches.last}%.2fs (batch=$nBatch = ${100.0 * nBatch / nCorpus}%.0f%% of corpus)")
    println(f"[probe] serve before=$sBefore%.2fs after=$sAfter%.2fs " +
      f"build/refresh=${tBuild / tBatches(4)}%.1fx")

    // the 10 appends left ~1 extra file per touched cell per batch —
    // compaction should claw back the serve-time file-open overhead
    val (_, tCompact) = timed(
      graft.operators.Similarity.compactIvfIndex(spark, corpus))
    val sCompacted = serve()
    println(f"[probe] compact t=$tCompact%.2fs serve_after_compact=$sCompacted%.2fs")

    // tombstone leg: delete a 1%-of-corpus id slice — cost must sit in
    // the per-batch class (touched-cells rewrite), not the build class
    val tombs = (0 until nBatch).map(i => 1000000L + i).toDF("vec_id")
    val (_, tDelete) = timed(
      graft.operators.Similarity.deleteFromIvfIndex(spark, corpus, tombs))
    val nAfterDelete = spark.read.parquet(idx).count()
    println(f"[probe] delete t=$tDelete%.2fs rows_after=$nAfterDelete")

    // replay-repair leg: double-append one batch, then repair — both
    // the damage and the cure are bounded by the batch's cells
    val dupBatch = graft.operators.Similarity
      .assignCells(spark, idx, synth(nBatch, 1000000L * 3)).localCheckpoint()
    graft.operators.Similarity.appendAssignedToIvfIndex(spark, corpus, dupBatch)
    val (removed, tRepair) = timed(
      graft.operators.Similarity.repairIvfIndexDuplicates(spark, corpus))
    println(f"[probe] repair t=$tRepair%.2fs removed=$removed")
    spark.stop()
  }
}
