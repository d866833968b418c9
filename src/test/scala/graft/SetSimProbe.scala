package graft.operators

import org.apache.spark.sql.functions._

/** Phase probe for join_set_similarity (guide §1.4 noop sink): where do
  * the ~6 cold seconds go — tokenize+distinct, the rarity ranking, the
  * prefix self-join, or the intersection re-attachments?
  *
  *   Test/runMain graft.operators.SetSimProbe
  */
object SetSimProbe {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    def timed(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"PROBE $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup the registered query once (JIT/codegen)
    Dedup.setSimilarityJoin(spark, d).count()

    val tok = graft.Tables.widened(graft.Tables.documents(spark, d))
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id", explode(expr(
        """transform(sequence(0, greatest(size(ws) - 3, 0)),
          |          i -> xxhash64(concat_ws(' ', slice(ws, i + 1, 3))))""".stripMargin))
        .as("sh"))
      .distinct()
    timed("1 tok (shingle+hash+distinct)")(noop(tok))
    println("PROBE n_tok = " + tok.count())
    val sizes = tok.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val dfq = tok.groupBy($"sh").agg(count(lit(1)).as("df"))
    val ranked = tok.join(dfq, "sh").join(sizes, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"sh")))
      .filter($"rn" <= $"n" - (($"n" + 1) / 2).cast("long") + 1)
      .select($"doc_id", $"sh", $"n", $"rn")
    timed("2 ranked (df join + window + prefix)")(noop(ranked))
    println("PROBE n_ranked = " + ranked.count())
    val cand = ranked.select($"doc_id".as("doc_a"), $"sh",
        $"n".as("n_a"), $"rn".as("ra"))
      .join(ranked.select($"doc_id".as("doc_b"), $"sh",
        $"n".as("n_b"), $"rn".as("rb")), "sh")
      .filter($"doc_a" < $"doc_b")
      .filter($"n_b" * 2 >= $"n_a" && $"n_a" * 2 >= $"n_b")
      .withColumn("ub", least($"ra", $"rb") +
        least($"n_a" - $"ra", $"n_b" - $"rb"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(min($"ub").as("ub"))
      .filter($"ub" * 3 >= $"n_a" + $"n_b")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b")
    timed("3 cand (prefix self-join + posfilter)")(noop(cand))
    println("PROBE n_cand = " + cand.count())
    val inter = cand
      .join(tok.select($"doc_id".as("doc_a"), $"sh"), "doc_a")
      .join(tok.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(count(lit(1)).as("n_inter"))
    timed("4 inter (two re-attach joins)")(noop(inter))
    timed("5 full query")(Dedup.setSimilarityJoin(spark, d).count())

    // variant: df and n as WINDOW counts over the two partitionings
    // (2 exchanges) instead of two aggregate+join subtrees (4)
    val wDocOrd = Window.partitionBy($"doc_id").orderBy($"df", $"sh")
    val ranked2 = tok
      .withColumn("df", count(lit(1)).over(Window.partitionBy($"sh")))
      .withColumn("n", count(lit(1)).over(
        wDocOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("rn", row_number().over(wDocOrd))
      .filter($"rn" <= $"n" - (($"n" + 1) / 2).cast("long") + 1)
      .select($"doc_id", $"sh", $"n", $"rn")
    timed("6 ranked2 (window df/n)")(noop(ranked2))
    val cand2 = ranked2.select($"doc_id".as("doc_a"), $"sh",
        $"n".as("n_a"), $"rn".as("ra"))
      .join(ranked2.select($"doc_id".as("doc_b"), $"sh",
        $"n".as("n_b"), $"rn".as("rb")), "sh")
      .filter($"doc_a" < $"doc_b")
      .filter($"n_b" * 2 >= $"n_a" && $"n_a" * 2 >= $"n_b")
      .withColumn("ub", least($"ra", $"rb") +
        least($"n_a" - $"ra", $"n_b" - $"rb"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(min($"ub").as("ub"))
      .filter($"ub" * 3 >= $"n_a" + $"n_b")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b")
    val inter2 = cand2
      .join(tok.select($"doc_id".as("doc_a"), $"sh"), "doc_a")
      .join(tok.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b", $"n_a", $"n_b")
      .agg(count(lit(1)).as("n_inter"))
    val full2 = inter2
      .filter($"n_inter" * 3 >= $"n_a" + $"n_b")
      .select($"doc_a", $"doc_b", $"n_a", $"n_b", $"n_inter",
        expr("(1000000 * n_inter) div (n_a + n_b - n_inter)").as("jaccard_e6"))
      .orderBy($"doc_a", $"doc_b")
    timed("7 full2 (window ranked)")(full2.count())
    timed("8 full2 again")(full2.count())
    println("PROBE full2 rows = " + full2.count())
    spark.stop()
  }
}
