package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.{SparkSuite, Tables}
import graft.operators.Similarity

/** Streaming ANN index maintenance: the served index must follow the
  * arrival stream (serve ≡ full recompute over the grown corpus between
  * any two micro-batches, each arrival appended exactly once — including
  * under batch replay), and the maintained health census must census
  * every arrival and raise the retrain flag when a drifted batch
  * concentrates into few cells, then clear it when arrivals normalize. */
class StreamingIndexSpec extends SparkSuite {

  private val SfSmall = "/root/testdata/sf0.001"

  test("served index follows the stream; health flag tracks drift recency; replay is idempotent") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // a corpus dir the test owns (the sf fixture is a read-only single file)
    val corpus = tmpDir("stream-index-corpus")
    val emb = Tables.embeddings(spark, SfSmall)
      .select($"vec_id", $"embedding", $"label")
    emb.filter($"vec_id" < 400).write.parquet(s"$corpus/embeddings.parquet")
    val idx = Similarity.ivfIndexDir(spark, corpus)
    // a not-yet-existing subpath: rollupExists keys the first-batch branch
    val healthDir = tmpDir("stream-index-health") + "/census"
    val in = MemoryStream[(Long, Seq[Float], Int)]
    val q = IndexStream.maintainIvf(spark, corpus,
      in.toDS().toDF("vec_id", "embedding", "label"),
      healthDir, tmpDir("stream-index-ckpt"))
    def health() =
      IndexStream.servedIndexHealth(spark, corpus, healthDir).collect().toSeq
    try {
      // micro-batch 1: organic growth — the held-out corpus tail
      val b1 = emb.filter($"vec_id" >= 400)
        .as[(Long, Seq[Float], Int)].collect().toSeq
      in.addData(b1: _*)
      q.processAllAvailable()
      // the ground-truth corpus grows the same way...
      emb.filter($"vec_id" >= 400).write.mode("append")
        .parquet(s"$corpus/embeddings.parquet")
      // ...and the maintained index serves the union: exhaustive probing
      // must equal brute force over the grown corpus
      def serveEqualsBrute(): Unit = {
        val viaIndex = Similarity.knnIvfIndexed(spark, corpus, nProbe = 16)
          .collect().map(_.toSeq).toSeq
        val brute = Similarity.knnBrute(spark, corpus)
          .collect().map(_.toSeq).toSeq
        assert(viaIndex == brute,
          "served index must equal full recompute over the grown corpus")
      }
      serveEqualsBrute()

      // micro-batch 2: drifted arrivals (coordinate 0 forced dominant —
      // the staleness fixture's shape) concentrating into few cells
      val drift = b1.take(40).map { case (id, v, l) =>
        (id + 5000L, Seq(10f) ++ v.drop(1), l) }
      in.addData(drift: _*)
      q.processAllAvailable()
      drift.toDF("vec_id", "embedding", "label").write.mode("append")
        .parquet(s"$corpus/embeddings.parquet")
      serveEqualsBrute()

      // exactly one index row per corpus row — nothing double-appended
      assert(spark.read.parquet(idx).count() == 400 + b1.size + drift.size)

      // the census saw every arrival, and the drifted LAST batch trips
      // the same >4x-uniform retrain rule the batch staleness report uses
      val h2 = health()
      assert(h2.map(_.getLong(1)).sum == b1.size + drift.size,
        "health census must cover every streamed arrival")
      val flagged = h2.filter(_.getInt(4) == 1)
      assert(flagged.nonEmpty, "concentrated drift must raise the retrain flag")
      // concentration, not totality: an occasional drifted vector can
      // land in a neighboring cell (the batch fixture sees 49/50)
      assert(flagged.map(_.getLong(3)).sum >= 30,
        "the flagged cells should hold the bulk of the drifted batch")

      // micro-batch 3: arrivals normalize — the flag must CLEAR (the
      // rule watches the last batch, not the diluted cumulative shares)
      val b3 = b1.take(48).map { case (id, v, l) => (id + 9000L, v, l) }
      in.addData(b3: _*)
      q.processAllAvailable()
      b3.toDF("vec_id", "embedding", "label").write.mode("append")
        .parquet(s"$corpus/embeddings.parquet")
      serveEqualsBrute()
      val h3 = health()
      assert(h3.map(_.getLong(1)).sum == b1.size + drift.size + b3.size)
      assert(h3.forall(_.getInt(4) == 0),
        "a normalized batch must clear the retrain flag")

      // replayed micro-batch (restart redelivery): batch ids at or below
      // the committed marker must fold in exactly zero rows
      val before = spark.read.parquet(idx).count()
      IndexStream.processBatch(spark, corpus,
        b3.toDF("vec_id", "embedding", "label"), batchId = 0L, healthDir)
      assert(spark.read.parquet(idx).count() == before,
        "a replayed batch id must not double-append")
      assert(health().map(_.getLong(1)).sum ==
        b1.size + drift.size + b3.size,
        "a replayed batch id must not double-count the census")

      // the residual crash window (append landed, marker did not):
      // simulate by appending the same assigned batch twice directly,
      // then prove the documented repair tool restores exactness
      val assigned = Similarity.assignCells(spark, idx,
        b3.toDF("vec_id", "embedding", "label")).localCheckpoint()
      Similarity.appendAssignedToIvfIndex(spark, corpus, assigned)
      assert(spark.read.parquet(idx).count() == before + b3.size,
        "window fixture: one duplicate copy of the batch is in")
      val removed = Similarity.repairIvfIndexDuplicates(spark, corpus)
      assert(removed == b3.size,
        s"repair must remove exactly the duplicated batch, got $removed")
      assert(spark.read.parquet(idx).count() == before)
      serveEqualsBrute()
    } finally q.stop()
  }
}
