package graft.operators

import org.apache.spark.sql.functions._

/** Phase-timing probe for the dedup_ngram_jaccard pipeline (guide §1:
  * isolate with the noop sink so we time computation, not the sink). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession.local(cpus)
    import spark.implicits._

    def timed(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup whole pipeline once (JIT/codegen/listing)
    Dedup.ngramJaccardPairs(spark, d).count()
    SessionCaches.clear(spark)

    val docs = graft.Tables.documents(spark, d)
    timed("0 docs scan")(noop(docs))
    val sh = Dedup.shingleSets(spark, d)
    timed("1 shingles")(noop(sh))
    val sigs = Dedup.withMinhashSig(sh)
    timed("2 shingles+minhash")(noop(sigs))
    val sigsP = sigs.persist()
    timed("2b persist sigs")(noop(sigsP))
    val banded = Dedup.bandKeysOf(sigsP)
    timed("3 band keys")(noop(banded))
    val pairs = banded.groupBy($"band", $"key")
      .agg(collect_list($"doc_id").as("ids"))
      .filter(size($"ids").between(2, 500))
      .select(explode($"ids").as("doc_a"), $"ids")
      .select($"doc_a", explode($"ids").as("doc_b"))
      .filter($"doc_a" < $"doc_b")
      .dropDuplicates("doc_a", "doc_b")
    timed("4 grouped pairgen + dedup pairs")(noop(pairs))
    println("PROBE n_pairs = " + pairs.count())
    val cands = pairs
      .join(sigsP.select($"doc_id".as("doc_a"), $"sig".as("sig_a")), "doc_a")
      .join(sigsP.select($"doc_id".as("doc_b"), $"sig".as("sig_b")), "doc_b")
    timed("5 attach sigs")(noop(cands))
    val survivors = cands.filter(Dedup.estJaccardExpr >= 0.25)
      .select($"doc_a", $"doc_b")
    println("PROBE n_survivors = " + survivors.count())
    val scored = survivors
      .join(sigsP.select($"doc_id".as("doc_a"), $"sh".as("sh_a")), "doc_a")
      .join(sigsP.select($"doc_id".as("doc_b"), $"sh".as("sh_b")), "doc_b")
      .select($"doc_a", $"doc_b",
        Dedup.exactJaccardCol($"sh_a", $"sh_b").as("jaccard"))
    timed("6 attach sh + exact jaccard")(noop(scored))
    timed("7 full verifiedPairs artifact")(
      Dedup.ngramJaccardPairs(spark, d).count())
    sigsP.unpersist()
    spark.stop()
  }
}
