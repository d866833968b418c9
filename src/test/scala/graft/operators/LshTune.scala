package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** One-off band-shape tuner for the MinHash-LSH recall dial (run:
  * sbt "Test/runMain graft.operators.LshTune"). Same ground-truth corpus as
  * ScaleStress Leg 2 (20 replicas × 5,000 origins, ~10% token dropout →
  * 950k true near-dup pairs); measures recall/precision/candidate count for
  * several (bands × rows) shapes over the k=32 signature in one session.
  * Results recorded in SCALE_NOTES.md. */
object LshTune {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val corpus = Tables.documents(spark, d)
      .select($"doc_id", explode(expr("sequence(0, 19)")).as("rep"), $"text")
      .select(
        ($"doc_id" * 20 + $"rep").as("doc_id"),
        expr("""array_join(filter(split(text, ' '),
               |          t -> pmod(xxhash64(t, rep), 10) != 0), ' ')""".stripMargin)
          .as("text"))
    val sh = corpus.filter(size(split($"text", " ")) >= 3)
      .select($"doc_id", expr(
        """array_distinct(transform(sequence(0, size(split(text, ' ')) - 3),
          |               i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3))))"""
          .stripMargin).as("sh"))
    val sigs = Dedup.withMinhashSig(sh).select($"doc_id", $"sig").persist()
    println(s"[tune] docs: ${sigs.count()}")

    // measured pairwise Jaccard of a sample of true pairs, for calibration
    val sample = sh.filter($"doc_id" % 20 === 0).select($"doc_id".as("a_id"), $"sh".as("sh_a"))
      .join(sh.filter($"doc_id" % 20 === 1).select(($"doc_id" - 1).as("a_id"), $"sh".as("sh_b")), "a_id")
      .limit(2000)
      .select(avg(size(array_intersect($"sh_a", $"sh_b")).cast("double") /
        size(array_union($"sh_a", $"sh_b"))).as("j"))
      .head().getDouble(0)
    println(f"[tune] measured replica-replica shingle Jaccard: $sample%.3f")

    for ((bands, rows, cap) <- Seq((10, 3, 500), (10, 3, 2000), (10, 3, 10000),
                                   (16, 2, 500), (16, 2, 2000))) {
      val t0 = System.nanoTime()
      val banded = sigs.select($"doc_id",
          explode(expr(
            s"""transform(sequence(0, ${bands - 1}),
               |          b -> named_struct('band', b, 'key', xxhash64(slice(sig, b * $rows + 1, $rows))))"""
              .stripMargin)).as("bk"))
        .select($"doc_id", $"bk.band", $"bk.key")
      val small = banded.groupBy($"band", $"key")
        .agg(count(lit(1)).as("n")).filter($"n" <= cap).select($"band", $"key")
      val pruned = banded.join(small, Seq("band", "key"))
      val a = pruned.select($"band", $"key", $"doc_id".as("doc_a"))
      val b = pruned.select($"band", $"key", $"doc_id".as("doc_b"))
      val cands = a.join(b, Seq("band", "key")).filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b").dropDuplicates("doc_a", "doc_b")
      val agg = cands.select(
        count(lit(1)).as("total"),
        sum(when(($"doc_a" / 20).cast("long") === ($"doc_b" / 20).cast("long"), 1L)
          .otherwise(0L)).as("same")).head()
      val (total, same) = (agg.getLong(0), agg.getLong(1))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[tune] ${bands}x$rows cap=$cap: cands=$total%d recall=${same / 950000.0}%.3f " +
        f"precision=${same.toDouble / total}%.3f time=$secs%.1f s")
    }
    spark.stop()
  }
}
