package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCALE_NOTES Leg 7 measurement (run manually, results recorded there):
  * the corpus-level dedup family at 20× sf0.1 (100k docs, ~5.4M tokens).
  *
  * The blown-up corpus is 20 copies with doc ids shifted and every token
  * suffixed per copy — content-DISJOINT copies, so the per-copy duplicate
  * structure is exactly that of sf0.1 and every output count must scale
  * by exactly 20 (a correctness-at-scale invariant, asserted), while
  * wall-time measures how the plans scale (expected ~linear: every
  * shuffle is keyed on content hashes or doc ids, no all-pairs step).
  */
object CorpusScaleTune {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    import spark.implicits._
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select($"doc_id", $"text", $"lang", $"source")
    val copies = 20
    val big = (0 until copies).map { i =>
      base.select(
        ($"doc_id" + lit(i.toLong * 1000000L)).as("doc_id"),
        regexp_replace($"text", "(\\S+)", s"$$1_c$i").as("text"),
        $"lang", $"source")
    }.reduce(_ union _).localCheckpoint()
    println(s"[corpusscale] docs=${big.count()}")

    def leg(name: String, one: => DataFrame, twenty: => DataFrame): Unit = {
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
      }
      val (n1, t1) = time(one.count())
      val (n20, t20) = time(twenty.count())
      println(f"[corpusscale] $name: 1x $n1%d rows in $t1%.2f s; 20x $n20%d rows " +
        f"in $t20%.2f s; rows x${n20.toDouble / n1}%.1f time x${t20 / t1}%.1f")
    }
    leg("segment_dedup",
      CorpusDedup.segmentDedupStats(base),
      CorpusDedup.segmentDedupStats(big))
    leg("substring_spans",
      CorpusDedup.substringSpanStats(base),
      CorpusDedup.substringSpanStats(big))
    leg("decontaminate",
      CorpusDedup.decontaminateStats(base),
      CorpusDedup.decontaminateStats(big))
    leg("unigram_surprise",
      CorpusDedup.unigramSurpriseStats(base),
      CorpusDedup.unigramSurpriseStats(big))
    spark.stop()
  }
}
