package graft.operators

import org.apache.spark.sql.functions._

/** SCALE_NOTES Leg 19 measurement (run manually, results recorded there):
  * BPE vocabulary training at 20× sf0.1 (100k docs).
  *
  * The blown-up corpus is 20 VERBATIM copies with shifted doc ids —
  * identical text, so the distinct-word table is IDENTICAL with counts
  * ×20, and the learned merge table must be exactly the base table with
  * every pair_count ×20 (asserted). What changes is the corpus-sized
  * work: the one tokenize scan + word-count aggregate. The 10 merge
  * rounds run on the same ≤5 000-row vocab table either way — the claim
  * that training cost is dominated by the single corpus scan, measured.
  */
object BpeScaleTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text")
    val copies = 20
    val big = (0 until copies).map { i =>
      base.select(($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"), $"text")
    }.reduce(_ union _).localCheckpoint()
    println(s"[bpescale] docs=${big.count()}")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    Bpe.learnMergesOf(base) // untimed warmup: JIT + codegen caches
    val (m1, t1) = timed(Bpe.learnMergesOf(base))
    val (m20, t20) = timed(Bpe.learnMergesOf(big))
    println(f"[bpescale] train 1x in $t1%.2f s; 20x in $t20%.2f s; time x${t20 / t1}%.2f")
    val scaled = m1.map { case (r, a, b, c) => (r, a, b, c * copies) }
    assert(m20 == scaled,
      s"20x merges must be base merges with counts x20:\nbase=$m1\nbig =$m20")
    println(s"[bpescale] merge tables identical (counts x$copies): OK")
    spark.stop()
  }
}
