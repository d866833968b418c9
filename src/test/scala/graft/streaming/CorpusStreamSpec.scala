package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSuite

/** Streaming segment dedup: first occurrence passes, in-watermark
  * duplicates are suppressed across micro-batches, and the emitted
  * segments agree with the batch operator's keep-set on the same docs. */
class CorpusStreamSpec extends SparkSuite {

  private def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000)

  // ten-token segments with distinct vocabularies
  private def seg(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")

  test("cross-batch duplicate segments are suppressed within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = CorpusStream.dedupedSegments(
      in.toDS().toDF("doc_id", "ts", "text"), watermark = "60 minutes")
    val q = out.writeStream.format("memory").queryName("seg_dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: doc 1 carries segments s1, s2
      in.addData((1L, ts(0), s"${seg("s1x")} ${seg("s2x")}"))
      q.processAllAvailable()
      // batch 2: doc 2 repeats s1 (suppressed) and adds s3 (passes);
      // doc 3 repeats s1 within the same batch (suppressed too)
      in.addData(
        (2L, ts(5), s"${seg("s1x")} ${seg("s3x")}"),
        (3L, ts(6), seg("s1x")))
      q.processAllAvailable()

      val got = spark.table("seg_dedup_out")
        .select("doc_id", "seg_idx").as[(Long, Int)].collect().toSet
      assert(got === Set((1L, 0), (1L, 1), (2L, 1)), s"got $got")

      // batch-operator agreement: the batch keep-set over the same docs
      // elects the same segments (doc 1 both, doc 2 one, doc 3 none)
      val batch = graft.operators.CorpusDedup.segmentDedupStats(
        Seq((1L, s"${seg("s1x")} ${seg("s2x")}"),
            (2L, s"${seg("s1x")} ${seg("s3x")}"),
            (3L, seg("s1x"))).toDF("doc_id", "text"))
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(batch === Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
    } finally q.stop()
  }

  test("semantic admission: corpus dups dropped, novel passes, exact repeat suppressed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val emb = graft.Tables.embeddings(spark, Sf)
    // vec 10 is IN the corpus split (10 % 10 = 0): an arrival carrying its
    // embedding is a semantic duplicate. vec 7 is NOT (7 % 10 = 7), and
    // the corpus is isotropic, so its embedding is novel.
    val dupVec = emb.filter($"vec_id" === 10L).select("embedding").head.getSeq[Float](0)
    val novelVec = emb.filter($"vec_id" === 7L).select("embedding").head.getSeq[Float](0)
    val in = MemoryStream[(Long, java.sql.Timestamp, Seq[Float])]
    val out = CorpusStream.semanticAdmission(
      spark, Sf, in.toDS().toDF("vec_id", "ts", "embedding"),
      watermark = "60 minutes")
    val q = out.writeStream.format("memory").queryName("sem_admit")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((900001L, ts(0), dupVec), (900002L, ts(1), novelVec))
      q.processAllAvailable()
      // an exact repeat of the admitted novel arrival, still in-watermark:
      // suppressed by the content-signature stage, not re-admitted
      in.addData((900003L, ts(2), novelVec))
      q.processAllAvailable()
      val got = spark.table("sem_admit").select("vec_id").as[Long].collect().toSet
      assert(got === Set(900002L), s"got $got")
    } finally q.stop()
  }

  test("dedup state expires once the watermark passes a segment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = CorpusStream.dedupedSegments(
      in.toDS().toDF("doc_id", "ts", "text"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("seg_dedup_ttl")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((1L, ts(0), seg("t1x")))
      q.processAllAvailable()
      // advance the watermark far past ts(0) + 10 min …
      in.addData((2L, ts(120), seg("other")))
      q.processAllAvailable()
      // … so a re-arrival of t1 is NO LONGER suppressed (state dropped —
      // bounded-state semantics, the documented divergence from batch)
      in.addData((3L, ts(121), seg("t1x")))
      q.processAllAvailable()
      val docs = spark.table("seg_dedup_ttl")
        .select("doc_id").as[Long].collect().toSet
      assert(docs === Set(1L, 2L, 3L), s"got $docs")
    } finally q.stop()
  }

  test("perplexity admission: fluent passes, gibberish dropped, repeat suppressed, score == batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // take a document the batch gate itself KEEPS (lowest perplexity, so
    // comfortably under the threshold); a fully out-of-vocabulary string
    // scores at the unseen-context floor and must be dropped
    val keptId = graft.operators.NgramLm.bigramPpl(spark, Sf)
      .orderBy($"logppl_micro", $"doc_id").select($"doc_id").as[Long].head()
    val fluent = graft.Tables.documents(spark, Sf)
      .where($"doc_id" === keptId).select($"doc_id", $"text").head()
    val gibberish = (1 to 12).map(i => s"zqxj$i").mkString(" ")
    val in = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = CorpusStream.perplexityAdmission(
      spark, Sf, in.toDS().toDF("doc_id", "ts", "text"), watermark = "60 minutes")
    val q = out.writeStream.format("memory").queryName("ppl_admit")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData((800001L, ts(0), fluent.getString(1)),
        (800002L, ts(1), gibberish))
      q.processAllAvailable()
      in.addData((800003L, ts(2), fluent.getString(1))) // exact repeat
      q.processAllAvailable()
      val got = spark.table("ppl_admit")
        .select($"doc_id", $"logppl_micro").as[(Long, Long)].collect().toMap
      assert(got.keySet === Set(800001L), s"got ${got.keySet}")
      // the stream scorer must produce the IDENTICAL integer the batch
      // text_bigram_ppl computes for the same document
      val batch = graft.operators.NgramLm.bigramPpl(spark, Sf)
        .where($"doc_id" === fluent.getLong(0))
        .select($"logppl_micro").as[Long].head()
      assert(got(800001L) === batch)
    } finally q.stop()
  }
}
